package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-iteration link analysis over pair graphs the dedup pipeline
  * already produces — PageRank (Page, Brin, Motwani & Winograd 1999) as
  * a centrality signal for canonical-document selection inside
  * near-duplicate clusters. Where [[Dedup.keepBestByComponents]] picks a
  * cluster representative by an EXTERNAL score (quality), centrality
  * picks it by the graph itself: the doc most tightly linked into its
  * duplicate family is the one mirror/spam variants orbit around, which
  * is the canonical-URL heuristic web-corpus curation uses when no
  * quality model is in the loop.
  *
  * Shape at 100 TB: the classic Pregel iteration lowered onto relational
  * ops — each round is ONE equi-join (ranks ⋈ out-degree-weighted edges,
  * hash-shuffled on the source id) and ONE groupBy on the destination id
  * (map-side partial sums), both AQE-planned; no driver-side state, no
  * windows. The edge table comes from the capped pair generators
  * ([[Dedup.verifiedNearDups]] et al.), so its size is bounded by the
  * LSH bucket cap, not the corpus — and its (expensive) lineage is cut
  * with ONE `localCheckpoint` so the loop replays scans of materialized
  * blocks, never the minhash chain (same idiom as
  * [[Dedup.ccConvergedStars]]). Iteration count is fixed and small:
  * duplicate families are tiny-diameter graphs, where 3 rounds of power
  * iteration already separate hubs from leaves; this is a RANKING signal
  * (argmax per cluster), not a numerics exercise, so convergence to
  * machine epsilon is not the goal.
  */
object Graph {

  /** PageRank over an undirected pair list — pairs are symmetrized into
    * directed edges both ways, so every node has out-degree ≥ 1 and the
    * dangling-mass term vanishes by construction. Nodes never appearing
    * in a pair are NOT ranked (a doc with no duplicate edges needs no
    * canonicalization); N in the teleport term is the edge-graph node
    * count.
    *
    * r₀(v) = 1/N;  rₜ₊₁(v) = teleport/N + damping · Σ_{u∈nbr(v)} rₜ(u)/deg(u)
    *
    * `teleport` is taken as its own literal rather than computed as
    * 1 − damping: the SQL oracle writes `0.15` and IEEE `1.0 - 0.85` is
    * one ulp away from the nearest double to 0.15 — sharing the literal
    * keeps engine and oracle bit-identical. Intermediate ranks are
    * rounded to 12 dp each round (both sides) so cross-engine summation
    * -order noise cannot compound across iterations.
    *
    * @param pairs (id1, id2) rows, one per undirected edge; duplicates
    *              and orientation are normalized away internally
    * @return (node, pagerank) — pagerank at 12 dp, Σ ≈ 1 over the graph
    */
  def pageRankUndirected(pairs: DataFrame, iters: Int = 3,
      damping: Double = 0.85, teleport: Double = 0.15,
      id1: String = "id1", id2: String = "id2"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(math.abs(damping + teleport - 1.0) < 1e-9,
      s"damping + teleport must be 1, got $damping + $teleport")
    // Cut the pair lineage BEFORE symmetrizing: the union below
    // references its input twice, so checkpointing after it would run
    // the (expensive) pair-generator chain twice inside one job —
    // measured 2× the whole-query cost at 30× before this ordering.
    val p = pairs.select(col(id1).as("u"), col(id2).as("v"))
      .localCheckpoint()
    // symmetrize; distinct guards against duplicate input pairs. Also
    // checkpointed (tiny — the pair list is already materialized) so the
    // deg/nRow/r0 derivations below stay scans in the final plan instead
    // of re-inlining the union+distinct per reference.
    val e = p.union(p.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .localCheckpoint()
    val deg = e.groupBy(col("u")).agg(count(lit(1)).cast("double").as("d"))
    // 1-row scalar broadcast (the accepted crossJoin(broadcast) pattern)
    val nRow = broadcast(deg.agg(count(lit(1)).cast("double").as("n")))
    // (u, v, deg(u)) — checkpointed so each round scans blocks, not plans
    val contrib = e.join(deg, Seq("u")).localCheckpoint()
    var r = deg.crossJoin(nRow)
      .select(col("u"), round(lit(1.0) / col("n"), 12).as("pr"))
    for (_ <- 1 to iters) {
      r = contrib.join(r, Seq("u"))
        .groupBy(col("v"))
        .agg(sum(col("pr") / col("d")).as("m"))
        .crossJoin(nRow)
        .select(col("v").as("u"),
          round(lit(teleport) / col("n") + lit(damping) * col("m"), 12)
            .as("pr"))
    }
    r.select(col("u").as("node"), col("pr").as("pagerank"))
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-edge triangle support for a marked subset of edges — the
    * corroboration audit for newly-admitted near-dup pairs: a pair
    * embedded in triangles (common neighbors in the dup graph) is a
    * corroborated duplicate; a support-0 pair is an isolated claim, the
    * first thing to re-verify when tuning thresholds (support is the
    * quantity k-truss denoising cuts on). Batch×history shape: only the
    * marked (batch) edges are scored, but support counts common
    * neighbors in the FULL graph — the same
    * only-new-work-per-refresh contract as the incremental dedup
    * admission family.
    *
    * Shape at 100 TB: two equi-joins of the batch edge list against the
    * symmetric adjacency of the (capped, checkpointed) pair graph —
    * shuffled on the endpoint then on (endpoint, candidate-neighbor) —
    * plus one count aggregate; support-0 edges are restored by a final
    * left join against the batch list itself. Nothing scales with the
    * corpus, only with the bounded pair graph.
    *
    * @param isBatch predicate over the input pair columns marking the
    *                newly-arrived edges to score
    * @return (id1, id2, n_common) — one row per batch edge, canonical
    *         orientation, n_common ≥ 0
    */
  def edgeSupport(pairs: DataFrame, isBatch: Column,
      id1: String = "id1", id2: String = "id2"): DataFrame = {
    // ONE row per canonical edge with the batch flag AGGREGATED (max):
    // the same undirected edge arriving in both orientations under an
    // orientation-sensitive `isBatch` predicate must not survive as two
    // (u, v, _b) rows — that would double its row in `adj` (inflating
    // every common-neighbor count it participates in) and score the
    // edge twice. An edge marked batch in ANY orientation is batch.
    val p = pairs.select(
        least(col(id1), col(id2)).as("u"),
        greatest(col(id1), col(id2)).as("v"),
        isBatch.as("_b"))
      .filter(col("u") =!= col("v"))
      .groupBy(col("u"), col("v"))
      .agg(max(col("_b")).as("_b"))
      .localCheckpoint()
    val adj = p.select(col("u").as("x"), col("v").as("y"))
      .union(p.select(col("v").as("x"), col("u").as("y")))
    val b = p.filter(col("_b")).select(col("u"), col("v"))
    val counts = b
      .join(adj.select(col("x").as("u"), col("y").as("c")), Seq("u"))
      .join(adj.select(col("x").as("v"), col("y").as("c")), Seq("v", "c"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("n"))
    b.join(counts, Seq("u", "v"), "left_outer")
      .select(col("u").as(id1), col("v").as(id2),
        coalesce(col("n"), lit(0L)).as("n_common"))
  }

  /** Triangle census + global transitivity of an undirected pair graph —
    * the cluster-SHAPE health metric for a dedup run: true duplicate
    * families are near-cliques (transitivity → 1), while chain-like
    * components (transitivity → 0) are the signature of transitive
    * over-merging (A≈B≈C with A≉C), the classic LSH-dedup failure mode
    * a scalar pair count cannot see.
    *
    * All-integer until the final ratio: n_triangles by the oriented
    * edge-iterator join (Schank & Wagner 2005) — each triangle a<b<c is
    * found exactly once as path (a,b)+(b,c) closed by edge (a,c), so
    * the count needs no division — and n_wedges = Σ C(deg,2) via an
    * exact shift-right halving (d·(d−1) is always even). Transitivity
    * = 3·triangles/wedges. Output is ONE row.
    *
    * Shape at 100 TB: two self-equi-joins of the (capped, checkpointed)
    * edge list — shuffled on the shared vertex and on the closing
    * (a, c) key respectively — plus degree/count aggregates; nothing
    * scales with the corpus, only with the bounded pair graph. The
    * high-degree-vertex blowup the oriented join avoids: a hub of
    * degree d contributes only its HIGHER-numbered neighbors' pairs to
    * the path join, the same asymmetry that keeps [[Dedup]]'s CC
    * contraction skew-safe.
    */
  def triangleCensus(pairs: DataFrame,
      id1: String = "id1", id2: String = "id2"): DataFrame = {
    // canonical orientation u < v (every pair generator in Dedup emits
    // id1 < id2 already; normalize defensively), lineage cut ONCE before
    // the self-joins below reference the list three times
    val p = pairs.select(
        least(col(id1), col(id2)).as("u"),
        greatest(col(id1), col(id2)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    val sym = p.select(col("u").as("x")).union(p.select(col("v").as("x")))
    val nNodes = sym.distinct().agg(count(lit(1)).as("n_nodes"))
    val nEdges = p.agg(count(lit(1)).as("n_edges"))
    val wedges = sym.groupBy(col("x")).agg(count(lit(1)).as("d"))
      .agg(coalesce(sum(shiftright(col("d") * (col("d") - 1), 1)), lit(0L))
        .as("n_wedges"))
    val paths = p.select(col("u").as("a"), col("v").as("b"))
      .join(p.select(col("u").as("b"), col("v").as("c")), Seq("b"))
    val tri = paths
      .join(p.select(col("u").as("a"), col("v").as("c")), Seq("a", "c"),
        "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    nNodes.crossJoin(broadcast(nEdges)).crossJoin(broadcast(wedges))
      .crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        round(when(col("n_wedges") === 0, lit(0.0))
          .otherwise(lit(3.0) * col("n_triangles") / col("n_wedges")), 6)
          .as("transitivity"))
  }
}

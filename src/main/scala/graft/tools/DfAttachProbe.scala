package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ext.Dedup

/** The df-attach experiment, arm three (round-15 verdict item 4): race
  * the n-gram pair family's candidate generators at scale —
  *
  *   - `window`: the production form ([[graft.ext.Dedup.ngramCandidates]]
  *     — df as a count window over ONE hash(shingle) exchange whose sort
  *     the pair self-join reuses);
  *   - `agg`: the round-14 aggregate + anti/semi-join restructure, which
  *     re-evaluates the md5 posting lineage 3× (lost at 100× for exactly
  *     that);
  *   - `agg_mat`: the same restructure with the posting table
  *     localCheckpointed ONCE — the un-raced variant that stops re-paying
  *     the kernel, isolating whether the sortless shape beats the
  *     window's global sort when both pay the md5 once.
  *
  * All three run the IDENTICAL verify tails (q84's Jaccard 0.5, q92's
  * containment 0.6 — equivalence spec-pinned in DedupSpec), so the race
  * measures candidate generation only. Warm min-of-2 per form per query,
  * bench heap (GRAFT_MEM=8g), one JSON line per dir.
  *
  * Usage: runMain graft.tools.DfAttachProbe <sfDir> [<sfDir> ...]
  */
object DfAttachProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DfAttachProbe <sfDir> [<sfDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(2)
    val spark = ScaleKnobs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val docs = graft.core.Tables.load(spark, dir, "documents")
      // generator construction INSIDE the timed thunk: agg_mat's eager
      // localCheckpoint is part of the form's cost, not setup
      val forms: Seq[(String, () => (DataFrame, DataFrame, DataFrame))] = Seq(
        "window" -> (() =>
          Dedup.ngramCandidates(docs, 3, 2, 100, "text", "doc_id")),
        "agg" -> (() =>
          Dedup.ngramCandidatesAgg(docs, 3, 2, 100, "text", "doc_id",
            materialize = false)),
        "agg_mat" -> (() =>
          Dedup.ngramCandidatesAgg(docs, 3, 2, 100, "text", "doc_id",
            materialize = true)))
      val queries: Seq[(String, ((DataFrame, DataFrame, DataFrame)) => DataFrame)] = Seq(
        "q84_jaccard" -> { case (c, sh, st) =>
          Dedup.ngramJaccardFrom(c, sh, st, 0.5, "doc_id") },
        "q92_containment" -> { case (c, sh, st) =>
          Dedup.containmentFrom(c, sh, st, 0.6, "doc_id") })
      val cells = for ((qn, tail) <- queries; (fn, gen) <- forms) yield {
        var best = Double.MaxValue
        var rows = -1L
        for (_ <- 1 to passes) {
          val t0 = System.nanoTime()
          rows = tail(gen()).count()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        (qn, fn, best, rows)
      }
      // all three forms must agree on the row count — a cheap
      // equivalence tripwire on top of the spec-pinned exact equality
      for ((qn, group) <- cells.groupBy(_._1))
        require(group.map(_._4).distinct.size == 1,
          s"$qn row counts diverged across forms: $group")
      val body = cells.map { case (qn, fn, t, rows) =>
        f""""$qn.$fn":{"sec":$t%.3f,"rows":$rows}"""
      }.mkString(",")
      println(s"""{"dir":"$dir","passes":$passes,$body}""")
    }
    spark.stop()
  }
}

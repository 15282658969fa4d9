package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing and distribution-drift monitoring — the ops
  * loop around incremental refresh (q90/q98/q107/q111 admit batches;
  * this family answers "what actually changed, and did the data shift?"
  * between two published snapshots).
  *
  * Both operators are content-addressed and exact: membership is the
  * normalized text fingerprint (not the row id, so re-keyed or
  * re-ordered republications don't count as churn), and drift is a
  * KL divergence over add-k-smoothed token distributions computed from
  * exact integer counts — any engine replays it.
  */
object Drift {

  /** Per-source added/removed/kept counts between snapshots, by content
    * fingerprint. One aggregation per side on (source, fingerprint) —
    * dedup within a side counts once — then a full outer join on the
    * fingerprint key: at 100 TB this is the standard one-shuffle
    * set-reconciliation, no driver-side sets.
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    def fps(df: DataFrame) = df
      .select(col(sourceCol), TextAnalysis.fingerprint(col(textCol)).as("_fp"))
      .distinct()
    fps(v1).withColumn("_in1", lit(1))
      .join(fps(v2).withColumn("_in2", lit(1)),
        Seq(sourceCol, "_fp"), "full_outer")
      .groupBy(col(sourceCol))
      .agg(
        sum(when(col("_in2").isNotNull && col("_in1").isNull, 1L)
          .otherwise(0L)).as("n_added"),
        sum(when(col("_in1").isNotNull && col("_in2").isNull, 1L)
          .otherwise(0L)).as("n_removed"),
        sum(when(col("_in1").isNotNull && col("_in2").isNotNull, 1L)
          .otherwise(0L)).as("n_kept"))
  }

  /** Per-source KL divergence D(p2 ‖ p1) between the two snapshots'
    * token distributions, add-k smoothed over the per-source UNION
    * vocabulary (so both distributions are supported everywhere and the
    * divergence is finite): p_i(w) = (c_i(w)+k)/(n_i+k·V). The token
    * counts are one shuffle per side on (source, token); the union
    * vocabulary and totals fall out of the same full-outer-joined
    * frame, so no extra corpus pass. Output: (source, kl) — rising KL
    * on a source is the canonical "this crawl shifted under us" alarm.
    */
  def tokenKlDrift(v1: DataFrame, v2: DataFrame, k: Double = 0.5,
      sourceCol: String = "source", textCol: String = "text"): DataFrame =
    klFromCounts(tokenCountSnapshot(v1, sourceCol, textCol),
      tokenCountSnapshot(v2, sourceCol, textCol), k, sourceCol)

  /** Per-source token counts (source, w, c) — [[tokenKlDrift]]'s per-side
    * aggregate, exposed as the materialized side-input of the STREAMING
    * drift monitor: freeze it once for the published history snapshot
    * (one corpus shuffle, write-once), then every refresh batch KL-scores
    * against the frozen table with batch-sized work — history text is
    * never rescanned. The same decomposition q111's LM gate uses (frozen
    * model, stream-static scoring); see `DriftSpec`'s parity test for
    * the per-micro-batch `foreachBatch` wiring.
    */
  def tokenCountSnapshot(docs: DataFrame, sourceCol: String = "source",
      textCol: String = "text"): DataFrame = docs
    .select(col(sourceCol),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
    .groupBy(col(sourceCol), col("w")).agg(count(lit(1)).as("c"))

  /** KL divergence D(p2 ‖ p1) from two pre-aggregated token-count frames
    * ([[tokenCountSnapshot]] outputs) — the shared tail of the batch and
    * streaming forms. The union vocabulary, totals, and smoothing are
    * computed from the full-outer-joined counts exactly as documented on
    * [[tokenKlDrift]]; because the inputs are already aggregates, this is
    * vocabulary-sized work, independent of either corpus's size.
    */
  def klFromCounts(counts1: DataFrame, counts2: DataFrame, k: Double = 0.5,
      sourceCol: String = "source"): DataFrame = {
    val joined = counts1.withColumnRenamed("c", "c1")
      .join(counts2.withColumnRenamed("c", "c2"),
        Seq(sourceCol, "w"), "full_outer")
      .select(col(sourceCol),
        coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"))
    // per-source totals are a tiny frame broadcast back onto the token
    // counts; the divergence is then one ordinary scalar sum per source
    // (never a per-source vocabulary array on one task)
    val totals = joined.groupBy(col(sourceCol))
      .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        count(lit(1)).cast("double").as("v"))
    val p2 = (col("c2") + lit(k)) / (col("n2") + lit(k) * col("v"))
    val p1 = (col("c1") + lit(k)) / (col("n1") + lit(k) * col("v"))
    joined.join(broadcast(totals), Seq(sourceCol))
      .withColumn("_term", p2 * (log(p2) - log(p1)))
      .groupBy(col(sourceCol))
      .agg(sum(col("_term")).as("kl"))
  }
}

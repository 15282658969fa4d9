package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact top-k rows per key without concentrating any key's candidate
  * stream on one task.
  *
  * A single `row_number() OVER (PARTITION BY key)` is the textbook
  * formulation, but with few keys (per-anchor ANN mining, per-class
  * exemplars) it degenerates to num-keys tasks each sorting its key's
  * entire candidate set — the parallelism-1 window trap this repo
  * avoids everywhere (see `PrefixSum`). Instead: phase 1 ranks within
  * (key, input-partition) — fully parallel, and provably keeps every
  * global top-k row, since a row in the global top-k for its key is in
  * the top-k of ANY subset containing it — then phase 2 re-ranks the
  * ≤ k·numPartitions survivors per key, a bounded input no matter how
  * large the corpus. The result is the exact global top-k; the order
  * columns must include a total tie-break (e.g. the row id) for the
  * output to be deterministic.
  */
object TopK {

  /** @param rankCol if set, keep the final per-key rank (1..k) under
    *                this name (an IntegerType, as `row_number` yields).
    */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      k: Int, rankCol: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pre = Window.partitionBy(keys :+ spark_partition_id(): _*)
      .orderBy(order: _*)
    val fin = Window.partitionBy(keys: _*).orderBy(order: _*)
    val rn = rankCol.getOrElse("_tk_rn")
    val out = df
      .withColumn("_tk_pre", row_number().over(pre))
      .filter(col("_tk_pre") <= k)
      .drop("_tk_pre")
      .withColumn(rn, row_number().over(fin))
      .filter(col(rn) <= k)
    if (rankCol.isDefined) out else out.drop(rn)
  }
}

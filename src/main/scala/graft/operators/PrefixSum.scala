package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sum over a total ordering. A bare
  * `Window.orderBy(...)` with no partition keys is the classic
  * parallelism-1 trap: Spark moves ALL rows to one task (same bottleneck
  * as the reference's `windowAll`). This is the standard two-phase
  * alternative: range-partition by the ordering (so partition i holds a
  * contiguous ordered slice), run per-partition running sums in parallel,
  * then prefix the per-partition TOTALS (one row per partition — the only
  * unpartitioned window, over ~#partitions rows) and broadcast them back.
  * Results are a pure function of the ordering and values — independent
  * of partition boundaries.
  */
object PrefixSum {

  /** Append `cumCol` = running sum of `value` and (optionally) `rankCol` =
    * 1-based row number, both over the global ordering given by `order`.
    * The ordering must be total (ties make cum/rank assignment between the
    * tied rows partition-dependent).
    */
  def withGlobalCumSum(df: DataFrame, order: Seq[Column], value: Column,
      cumCol: String, rankCol: Option[String] = None): DataFrame = {
    require(order.nonEmpty, "order columns required")
    val local = Window.partitionBy("_pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = df
      .repartitionByRange(order: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_val", value)
      .withColumn("_local_cum", sum(col("_val")).over(local))
      .withColumn("_local_rn", row_number().over(
        Window.partitionBy("_pid").orderBy(order: _*)))
    val prefix = withLocal
      .groupBy(col("_pid"))
      .agg(sum(col("_val")).as("_ptotal"), count(lit(1)).as("_pcount"))
      .withColumn("_prefix",
        coalesce(sum(col("_ptotal")).over(Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_rn_prefix",
        coalesce(sum(col("_pcount")).over(Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_prefix"), col("_rn_prefix"))
    val joined = withLocal
      .join(broadcast(prefix), "_pid")
      .withColumn(cumCol, col("_prefix") + col("_local_cum"))
    rankCol.fold(joined)(rc =>
        joined.withColumn(rc, col("_rn_prefix") + col("_local_rn")))
      .drop("_pid", "_val", "_local_cum", "_local_rn", "_prefix", "_rn_prefix")
  }
}

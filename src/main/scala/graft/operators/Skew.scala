package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * At 100 TB a handful of hot keys (one viral user, one default enum value)
  * turn a keyed shuffle into a single straggler task. Salting splits each
  * hot key across `saltBuckets` partial groups, aggregates the partials in
  * parallel, then merges — two shuffles, both balanced. AQE's skew-join
  * handling covers joins; this covers aggregations, which AQE does not
  * rebalance.
  */
object Skew {

  /** Two-phase salted count: groupBy (key, salt) → partial counts →
    * groupBy key → merge. Result is identical to a plain
    * `groupBy(keys).count()` — the salt only changes the physical
    * distribution of work.
    */
  def saltedCount(df: DataFrame, keyCols: Seq[String], saltBuckets: Int = 16,
      countName: String = "cnt"): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as(countName))
  }

  /** Two-phase salted sum (same shape, any associative numeric merge). */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueExpr: Column,
      saltBuckets: Int = 16, sumName: String = "total"): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .withColumn("__v", valueExpr)
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col("__v")).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as(sumName))
  }
}

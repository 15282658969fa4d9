package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql package for Column ↔ catalyst Expression conversion
  * (Spark 4 made `classic.ExpressionUtils` private[sql]; defining custom
  * Catalyst expressions from a library requires this one-hop adapter).
  */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Register a Catalyst expression builder as a temp SQL function on an
    * existing session (sessionState is private[sql]; for new sessions use
    * `graft.functions.GraftExtensions` via `spark.sql.extensions`).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}

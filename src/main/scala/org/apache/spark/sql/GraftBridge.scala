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
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the greatest right timestamp ≤
  * the left timestamp within the same key — point-in-time correctness for
  * feature/label joins in training pipelines (Spark has no native ASOF).
  *
  * Implemented with the union + running-last-value trick, NOT a range
  * cross-join: tag both sides, union on (key, ts), and let a single
  * window pass carry the most recent right value forward onto left rows.
  * One shuffle on the key, O(n log n) per key for the sort — the only
  * as-of formulation that survives at scale (a theta-join `l.ts >= r.ts`
  * explodes quadratically).
  */
object AsofJoin {

  /** @param left      left (probe) side
    * @param right     right (reference) side
    * @param leftKey   join key column name on the left
    * @param rightKey  join key column name on the right
    * @param leftTs    left ordering column (numeric or timestamp)
    * @param rightTs   right ordering column, same type/scale as leftTs
    * @return left rows + `asof_ts` (matched right timestamp, null if no
    *         right row at-or-before the left one)
    */
  def backward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String): DataFrame = {
    val l = left.select(
      col(leftKey).as("__key"), col(leftTs).cast("long").as("__ts"),
      lit(1).as("__is_left"), struct(left.columns.map(col): _*).as("__l"))
    val r = right.select(
      col(rightKey).as("__key"), col(rightTs).cast("long").as("__ts"),
      lit(0).as("__is_left"), lit(null).cast(l.schema("__l").dataType).as("__l"))
    // right rows sort before left rows at equal ts → ties are inclusive (≤)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("asof_ts",
        last(when(col("__is_left") === 0, col("__ts")), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
    matched.select(col("__l.*"), col("asof_ts"))
  }
}

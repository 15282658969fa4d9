package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * A table range-partitioned/sorted on ONE key prunes scans filtered on
  * that key and nothing else; a 100 TB fact table queried on two
  * independent keys (e.g. part AND supplier) needs a layout where every
  * file covers a small RECTANGLE of the key space, so min/max footer
  * stats prune on either predicate. Interleaving the two keys' bits into
  * one sort key (the classic Z-order curve) does exactly that:
  * lexicographically adjacent z-values differ in low-order bits of both
  * dimensions, so each of k files spans ~√(N/k) of EACH dimension rather
  * than N/k of one and ALL of the other.
  *
  * Everything here is built-in integer arithmetic (no UDF, replayable in
  * any engine): bit i of x is (x div 2^i) mod 2, placed at position 2i
  * (and 2i+1 for y). Keys are masked to `bits` low bits — callers with
  * wider domains should bucket/hash into the mask range first (rank-based
  * quantiles preserve pruning better under skew; the masked identity is
  * right for dense surrogate keys).
  */
object Layout {

  /** Morton-interleaved z-key of two columns' low `bits` bits (bits ≤ 31:
    * every bit position stays < 2^62). `bits` is known at plan time, so
    * the key unrolls to constant-folded pure-integer shift/mod arithmetic
    * — no per-row array, no floating point anywhere.
    */
  def zorderKey2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val mx = pmod(x.cast("long"), lit(1L << bits))
    val my = pmod(y.cast("long"), lit(1L << bits))
    (0 until bits).map { i =>
      pmod(shiftright(mx, i), lit(2L)) * lit(1L << (2 * i)) +
        pmod(shiftright(my, i), lit(2L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Write `df` clustered by the z-order of (xCol, yCol): range-partition
    * on the z-key (each output file covers a contiguous z-range = a small
    * key-space rectangle) and sort within partitions so parquet row-group
    * stats are tight too. The z-key itself is dropped from the output —
    * it is a layout artifact, not data.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("_z", zorderKey2(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}

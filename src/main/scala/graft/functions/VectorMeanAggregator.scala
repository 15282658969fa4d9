package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate: element-wise mean of `array<float>` vectors —
  * computes a centroid per group in one distributed pass (partial sums
  * merge associatively; no posexplode shuffle of every element). This is
  * the `Aggregator[IN, BUF, OUT]` path from SURVEY.md §2 for custom
  * aggregates; register with `functions.udaf` for SQL use.
  */
object VectorMeanAggregator
    extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Float]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  /** Grow `sums` to `dim` (vector dimensions may legitimately vary only in
    * that the zero buffer starts empty; a genuine dimension mismatch in the
    * data widens the buffer rather than silently truncating the sum).
    */
  private def grown(sums: Array[Double], dim: Int): Array[Double] =
    if (sums.length >= dim) sums else java.util.Arrays.copyOf(sums, dim)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    if (v == null) return b
    val acc = grown(b._1, v.length)
    var i = 0
    while (i < v.length) { acc(i) += v(i); i += 1 }
    (acc, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    // The zero buffer is identified by n == 0, NOT by an empty sums array:
    // zero-length input vectors increment n while leaving sums empty, and
    // such a buffer still carries a count that must survive the merge.
    if (a._2 == 0) return b
    if (b._2 == 0) return a
    val out = grown(a._1.clone(), b._1.length)
    var i = 0
    while (i < b._1.length) { out(i) += b._1(i); i += 1 }
    (out, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Seq[Float] =
    if (r._2 == 0) Seq.empty
    else r._1.map(s => (s / r._2).toFloat).toSeq

  // Product encoder, NOT Encoders.kryo: the tuple maps to a native row
  // (array<double>, bigint), so buffer shuffle bytes are columnar-compact
  // and the serializer needs no java.nio reflective access — Kryo's
  // ByteBuffer path requires `--add-opens java.base/java.nio` on JDK17+
  // and fails with EXPRESSION_ENCODING_FAILED when launched without it.
  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()
}

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

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    if (v == null) return b
    val (sums, n) = b
    val acc = if (sums.isEmpty) new Array[Double](v.length) else sums
    var i = 0
    val m = math.min(acc.length, v.length)
    while (i < m) { acc(i) += v(i); i += 1 }
    (acc, n + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) return b
    if (b._1.isEmpty) return a
    val out = a._1.clone()
    var i = 0
    val m = math.min(out.length, b._1.length)
    while (i < m) { out(i) += b._1(i); i += 1 }
    (out, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Seq[Float] =
    if (r._2 == 0) Seq.empty
    else r._1.map(s => (s / r._2).toFloat).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.kryo[(Array[Double], Long)]
  override def outputEncoder: Encoder[Seq[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()
}

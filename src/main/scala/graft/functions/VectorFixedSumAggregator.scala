package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** Element-wise FIXED-POINT vector sum: each float component is rounded
  * to a 6dp integer (round-half-away-from-zero, the SQL ROUND contract
  * both Spark and DuckDB implement) and accumulated in a long — so the
  * aggregate is EXACT and order/partitioning-independent, unlike a
  * float/double sum whose value depends on reduction order. This is the
  * piece that makes a distributed Lloyd (k-means) round replayable by
  * an external engine ([[graft.ext.Similarity.kmeansCentroidsExact]]):
  * integer sums replay as `SUM(CAST(ROUND(x * 1e6) AS BIGINT))`, and
  * the mean is then ONE double division — deterministic IEEE — instead
  * of an engine-specific float reduction tree. Returns (sums, count);
  * map-side partials merge associatively, so the shuffle carries one
  * (long[dim], n) buffer per group per partition, never the vectors.
  */
object VectorFixedSumAggregator
    extends Aggregator[Seq[Float], (Array[Long], Long), (Seq[Long], Long)] {

  /** SQL ROUND semantics (half away from zero) — `math.round` rounds
    * half toward positive infinity, which diverges on negative .5s.
    */
  def fixed6(v: Float): Long = {
    val x = v.toDouble * 1e6
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong
  }

  override def zero: (Array[Long], Long) = (Array.empty[Long], 0L)

  // UNIFORM-DIMENSION contract: the mean this aggregate feeds divides
  // every component by the group's TOTAL row count, and the SQL replay
  // ([[graft.queries.Queries]]' kmeansExactAsgCtes) unnests components
  // and counts per (group, k) — the two agree ONLY when every vector in
  // a group has the same length. A ragged corpus would silently diverge
  // from the oracle, so mixed dimensions fail loudly here instead.
  private def sameDim(have: Int, got: Int): Unit =
    require(have == got, s"VectorFixedSumAggregator requires uniform " +
      s"vector dimensions within a group: saw both $have and $got")

  override def reduce(b: (Array[Long], Long), v: Seq[Float]): (Array[Long], Long) = {
    if (v == null) return b
    val acc =
      if (b._2 == 0) new Array[Long](v.length)
      else { sameDim(b._1.length, v.length); b._1 }
    var i = 0
    while (i < v.length) { acc(i) += fixed6(v(i)); i += 1 }
    (acc, b._2 + 1)
  }

  override def merge(a: (Array[Long], Long), b: (Array[Long], Long)): (Array[Long], Long) = {
    // zero buffers are identified by n == 0, not by emptiness of sums
    // (zero-length vectors increment n while leaving sums empty)
    if (a._2 == 0) return b
    if (b._2 == 0) return a
    sameDim(a._1.length, b._1.length)
    val out = a._1.clone()
    var i = 0
    while (i < b._1.length) { out(i) += b._1(i); i += 1 }
    (out, a._2 + b._2)
  }

  override def finish(r: (Array[Long], Long)): (Seq[Long], Long) =
    (r._1.toSeq, r._2)

  // Expression encoders → native (array<bigint>, bigint) rows; see the
  // VectorMeanAggregator note on why not Encoders.kryo
  override def bufferEncoder: org.apache.spark.sql.Encoder[(Array[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Long)]()
  override def outputEncoder: org.apache.spark.sql.Encoder[(Seq[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Long], Long)]()
}

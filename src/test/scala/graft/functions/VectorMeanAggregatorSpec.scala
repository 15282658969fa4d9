package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class VectorMeanAggregatorSpec extends SparkSpecBase {
  import spark.implicits._

  test("typed aggregator computes per-group centroids in one pass") {
    val df = Seq(
      (0, Seq(1f, 2f)), (0, Seq(3f, 4f)),
      (1, Seq(10f, 0f))).toDF("label", "embedding")
    val centroid = udaf(VectorMeanAggregator)
    val out = df.groupBy("label").agg(centroid(col("embedding")).as("c"))
      .as[(Int, Seq[Float])].collect().toMap
    assert(out(0) == Seq(2f, 3f))
    assert(out(1) == Seq(10f, 0f))
  }

  test("zero-length vectors count toward the divisor; dims widen, not truncate") {
    // A buffer holding only zero-length vectors has empty sums but n > 0 —
    // merging it must not drop that count (zero buffer is n == 0, not
    // sums.isEmpty), and mixed dimensions widen the accumulator.
    val empties = (Array.empty[Double], 5L)
    val sums = (Array(3.0, 6.0), 3L)
    val merged = VectorMeanAggregator.merge(empties, sums)
    assert(merged._2 == 8L)
    assert(VectorMeanAggregator.finish(merged) == Seq(0.375f, 0.75f))
    val widened = VectorMeanAggregator.merge((Array(1.0), 1L), (Array(1.0, 2.0), 1L))
    assert(widened._1.toSeq == Seq(2.0, 2.0) && widened._2 == 2L)
    val viaReduce = VectorMeanAggregator.reduce(
      VectorMeanAggregator.reduce(VectorMeanAggregator.zero, Seq.empty[Float]),
      Seq(2f, 4f))
    assert(VectorMeanAggregator.finish(viaReduce) == Seq(1f, 2f))
  }

  test("matches the posexplode formulation on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val centroid = udaf(VectorMeanAggregator)
    val viaAgg = emb.groupBy("label").agg(centroid(col("embedding")).as("c"))
      .as[(Int, Seq[Float])].collect().toMap
    val viaExplode = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg(col("v")).as("m"))
      .groupBy("label")
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label"), expr("transform(pm, x -> CAST(x.m AS FLOAT))").as("c"))
      .as[(Int, Seq[Float])].collect().toMap
    assert(viaAgg.keySet == viaExplode.keySet)
    viaAgg.foreach { case (label, c) =>
      val e = viaExplode(label)
      assert(c.length == e.length)
      c.zip(e).foreach { case (x, y) => assert(math.abs(x - y) < 1e-4f) }
    }
  }
}

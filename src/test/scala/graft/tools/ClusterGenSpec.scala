package graft.tools

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The clusterable-embedding fixture must be (a) bit-deterministic —
  * the committed recall grids are only replayable if regeneration is
  * exact — and (b) actually clustered, or the ANN recall audits are
  * back to pricing noise (the round-12 finding this fixture exists to
  * fix).
  */
class ClusterGenSpec extends SparkSpecBase {

  private val outA = "/tmp/clustergen_spec_a"
  private val outB = "/tmp/clustergen_spec_b"

  test("generation is deterministic, schema-exact, and unit-normalized") {
    ClusterGen.generate(spark, outA, n = 300, dim = 16, clusterSize = 30)
    ClusterGen.generate(spark, outB, n = 300, dim = 16, clusterSize = 30)
    val a = spark.read.parquet(s"$outA/embeddings.parquet")
    // driver-fixture schema: every registered query runs unchanged
    assert(a.schema("vec_id").dataType.typeName == "long")
    assert(a.schema("embedding").dataType.simpleString == "array<float>")
    assert(a.schema("label").dataType.typeName == "integer")
    val rowsA = a.orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    val rowsB = spark.read.parquet(s"$outB/embeddings.parquet")
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    assert(rowsA.length == 300)
    // bit-identical across regenerations (hash noise + fixed-seed
    // centers — nothing depends on partitioning or wall clock)
    assert(rowsA.toSeq == rowsB.toSeq)
    assert(rowsA.forall(_._2.length == 16))
    assert(rowsA.forall(r => r._3 >= 0 && r._3 < 10))
    // points are unit vectors (normalized after noise)
    assert(rowsA.forall { r =>
      math.abs(r._2.map(x => x.toDouble * x).sum - 1.0) < 1e-4
    })
  }

  test("planted clusters separate: intra-label cosine far above inter") {
    // clusterSize=30 over n=300 -> 10 clusters; label = cluster % 10 is
    // then a BIJECTION onto clusters, so label-mates = cluster-mates
    val emb = spark.read.parquet(s"$outA/embeddings.parquet")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    def cos(x: Seq[Float], y: Seq[Float]): Double =
      x.iterator.zip(y.iterator).map { case (u, v) => u.toDouble * v }.sum
    val pairs = for {
      i <- emb.indices; j <- (i + 1) until emb.length
    } yield (emb(i)._3 == emb(j)._3, cos(emb(i)._2, emb(j)._2))
    val (intra, inter) = pairs.partition(_._1)
    val intraAvg = intra.map(_._2).sum / intra.size
    val interAvg = inter.map(_._2).sum / inter.size
    // sigma=0.09 at dim=16: intra-cluster cosine ~ 1/(1+sigma^2*dim),
    // cross-cluster ~ 0 — the regime where quantizer quality and nprobe
    // have measurable prices
    assert(intraAvg > 0.5, s"intra-label cosine $intraAvg not clustered")
    assert(math.abs(interAvg) < 0.2, s"inter-label cosine $interAvg too high")
    assert(intraAvg - interAvg > 0.4)
  }
}

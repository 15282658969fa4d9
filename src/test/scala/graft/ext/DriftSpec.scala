package graft.ext

import graft.SparkSpecBase

class DriftSpec extends SparkSpecBase {
  import spark.implicits._

  test("snapshotDiff counts content churn per source, not row churn") {
    val v1 = Seq(
      (1L, "s1", "alpha beta"), (2L, "s1", "gamma delta"),
      (3L, "s2", "epsilon")).toDF("doc_id", "source", "text")
    val v2 = Seq(
      // same content under a NEW doc_id → kept, not churn
      (10L, "s1", "alpha beta"),
      // new content → added; "gamma delta" gone → removed
      (11L, "s1", "zeta eta"),
      // s2 unchanged
      (3L, "s2", "epsilon")).toDF("doc_id", "source", "text")
    val got = Drift.snapshotDiff(v1, v2)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("s1") == ((1L, 1L, 1L)))
    assert(got("s2") == ((0L, 0L, 1L)))
  }

  test("streaming KL monitor against a frozen snapshot matches the batch drift") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val history = Seq(("s1", "a a b"), ("s2", "x y")).toDF("source", "text")
    // the write-once side-input: history token counts, never rescanned
    val snapshot = Drift.tokenCountSnapshot(history).cache()
    val batchDocs = Seq(("s1", "b b b"), ("s2", "x y"))
    val ms = MemoryStream[(String, String)]
    ms.addData(batchDocs: _*)
    val got = scala.collection.mutable.Map.empty[String, Double]
    val q = ms.toDF.toDF("source", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Drift.klFromCounts(snapshot, Drift.tokenCountSnapshot(batch))
          .collect().foreach(r => got(r.getString(0)) = r.getDouble(1))
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val expect = Drift.tokenKlDrift(history, batchDocs.toDF("source", "text"))
      .as[(String, Double)].collect().toMap
    assert(got.toMap == expect)
    assert(got("s1") > 0.01 && math.abs(got("s2")) < 1e-12)
  }

  test("tokenKlDrift is zero on identical snapshots and positive under shift") {
    val v1 = Seq(("s1", "a a b"), ("s2", "x y")).toDF("source", "text")
    val same = Drift.tokenKlDrift(v1, v1)
      .as[(String, Double)].collect().toMap
    assert(same.values.forall(kl => math.abs(kl) < 1e-12))
    val shifted = Seq(("s1", "b b b"), ("s2", "x y")).toDF("source", "text")
    val drift = Drift.tokenKlDrift(v1, shifted)
      .as[(String, Double)].collect().toMap
    assert(drift("s1") > 0.01)
    assert(math.abs(drift("s2")) < 1e-12)
  }
}

package graft.operators

import graft.SparkSpecBase
import graft.core.{Address, User}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** The transformWithState backend must reproduce the same §2.1 contract as
  * the flatMapGroupsWithState one, with incremental ListState appends.
  */
class EnrichmentJoinTwsSpec extends SparkSpecBase {

  private val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
  private def u(id: String, name: String = "n") = User(id, name, s"$name@x", "F", ts)
  private def a(uid: String, tag: String) = Address(uid, tag, "c", s"S-$tag", "z", s"C-$tag")

  test("cumulative snapshots across micro-batches (RocksDB ListState)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Envelope]
    val q = EnrichmentJoinTws.joinStream(spark, input.toDS())
      .writeStream.format("memory").queryName("j1_tws")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // F3/F4: address before user buffers silently, then flows
      input.addData(Envelope.ofAddress(a("u1", "a0"), 0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM j1_tws").count() == 0)
      input.addData(Envelope.ofUser(u("u1"), 1))
      q.processAllAvailable()
      input.addData(Envelope.ofAddress(a("u1", "a1"), 2))
      q.processAllAvailable()
      // F6: user re-send, last-write-wins
      input.addData(Envelope.ofUser(u("u1", "renamed"), 3))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user.name, transform(addresses, x -> x.address) AS addrs FROM j1_tws")
        .collect().map(r => (r.getString(0), r.getSeq[String](1).toList))
      assert(rows.length == 3)
      assert(rows.map(_._2.size).sorted.toSeq == Seq(1, 2, 2))
      // buffered a0 present in the first emission; rename visible in the last
      assert(rows.exists { case (n, ad) => n == "renamed" && ad == List("a0", "a1") })
      assert(rows.forall(_._2.head == "a0"))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("checkpoint recovery at large key count: restart resumes 20k-key state intact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val cp = java.nio.file.Files.createTempDirectory("graft-tws-recovery").toString
    val n = 20000
    val input = MemoryStream[Envelope]
    val counts = new java.util.concurrent.atomic.AtomicLong()
    def runWave(): Unit = {
      val q = EnrichmentJoinTws.joinStream(spark, input.toDS())
        .toDF().select(org.apache.spark.sql.functions.col("user.id"))
        .writeStream
        .option("checkpointLocation", cp)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          counts.addAndGet(b.count()); ()
        }
        .start()
      q.awaitTermination(300000)
      q.stop()
    }
    try {
      // wave 1: n users → n snapshot emissions, state = n keys
      input.addData((0 until n).map(i =>
        Envelope.ofUser(u(i.toString), 0)): _*)
      runWave()
      assert(counts.get() == n.toLong)
      // wave 2 RESUMES the checkpoint at n keys: one address per existing
      // key must emit exactly one snapshot each — possible only if the
      // restarted store still holds every buffered user
      input.addData((0 until n).map(i =>
        Envelope.ofAddress(a(i.toString, s"addr$i"), 1)): _*)
      runWave()
      assert(counts.get() == 2L * n,
        s"expected ${2L * n} total emissions after recovery, got ${counts.get()}")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

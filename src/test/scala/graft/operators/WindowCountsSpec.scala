package graft.operators

import graft.SparkSpecBase
import graft.core.{Address, User, UserAddress}
import org.apache.spark.sql.functions._

/** W1/A1+W2/A2 semantics incl. the §2.1 over-counting consequence (F7/F8 of
  * FIXTURES.md §4): every cumulative snapshot contributes ALL its addresses
  * to the window it lands in.
  */
class WindowCountsSpec extends SparkSpecBase {
  import spark.implicits._

  private val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
  private def u1 = User("u1", "n", "e", "F", ts)
  private def addr(tag: String, state: String) = Address("u1", tag, "c", state, "z", s"C-$state")

  private def snapshotsDf(snaps: Seq[(UserAddress, String)]) =
    snaps.toDF("ua", "procTimeStr")
      .select(col("ua.user").as("user"), col("ua.addresses").as("addresses"),
        to_timestamp(col("procTimeStr")).as("procTime"))

  test("F7: full F2 interleaving inside one window over-counts a1×3,a2×2,a3×1") {
    val t = "2026-01-01 10:00:10"
    val snaps = Seq(
      (UserAddress(u1, Seq()), t),
      (UserAddress(u1, Seq(addr("a1", "S1"))), t),
      (UserAddress(u1, Seq(addr("a1", "S1"), addr("a2", "S1"))), t),
      (UserAddress(u1, Seq(addr("a1", "S1"), addr("a2", "S2"), addr("a3", "S2"))), t))
    val counts = WindowCounts.countByState(snapshotsDf(snaps))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    // S1: a1 three times + a2 once = 4; S2: a2 once + a3 once = 2
    assert(counts == Map("S1" -> 4, "S2" -> 2))
  }

  test("F8: snapshots straddling the minute boundary split per window") {
    val snaps = Seq(
      (UserAddress(u1, Seq(addr("a1", "S1"))), "2026-01-01 10:00:59"),
      (UserAddress(u1, Seq(addr("a1", "S1"), addr("a2", "S1"))), "2026-01-01 10:01:01"))
    val rows = WindowCounts.countByState(snapshotsDf(snaps))
      .orderBy("window_start").collect()
    assert(rows.map(_.getLong(2)).toSeq == Seq(1, 2))
    assert(rows.map(_.getTimestamp(0).toString).toSeq ==
      Seq("2026-01-01 10:00:00.0", "2026-01-01 10:01:00.0"))
  }

  test("null-keyed addresses form their own group; placeholders still dropped") {
    // Reference parity: Main.java:142-148 HashMap.put(null, ...) counts
    // null state keys — only explode_outer placeholder rows (empty
    // snapshots) must vanish, not genuine addresses with a null state.
    val t = "2026-01-01 10:00:10"
    val snaps = Seq(
      (UserAddress(u1, Seq()), t), // placeholder-only snapshot
      (UserAddress(u1, Seq(Address("u1", "a1", "c", null, "z", "C1"))), t),
      (UserAddress(u1, Seq(addr("a2", "S1"))), t))
    val counts = WindowCounts.countByState(snapshotsDf(snaps))
      .collect().map(r => (Option(r.getString(1)), r.getLong(2))).toMap
    assert(counts == Map(Option(null) -> 1L, Some("S1") -> 1L))
  }

  test("session windows emit in streaming append mode once the watermark passes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val sessions = input.toDF().toDF("ts", "user")
      .withWatermark("ts", "1 minute")
      .groupBy(col("user"), session_window(col("ts"), "30 minutes").as("sw"))
      .count()
      .select(col("user"), col("sw.start").as("start"), col("count"))
    val q = sessions.writeStream.format("memory").queryName("session_stream")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      // one session (10:00 extended by 10:10), then a gap > 30 min
      input.addData((t("2026-01-01 10:00:00"), "u1"), (t("2026-01-01 10:10:00"), "u1"),
        (t("2026-01-01 11:30:00"), "u1"))
      q.processAllAvailable()
      // watermark (11:29) has passed the first session's end (10:40) → emits
      input.addData((t("2026-01-01 13:00:00"), "u1"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user, start, count FROM session_stream")
        .collect().map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2)))
      assert(rows.toSet.contains(("u1", "2026-01-01 10:00:00.0", 2L)))
    } finally q.stop()
  }

  test("sliding windows emit every overlapping pane in streaming append mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val slid = input.toDF().toDF("ts", "user")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .count()
      .select(col("w.start").as("start"), col("count"))
    val q = slid.writeStream.format("memory").queryName("sliding_stream")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      // an event at 10:07 belongs to panes [10:00,10:10) and [10:05,10:15)
      input.addData((t("2026-01-01 10:07:00"), "u1"))
      q.processAllAvailable()
      // advance the watermark past both pane ends → both emit exactly once
      input.addData((t("2026-01-01 10:30:00"), "u2"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT start, count FROM sliding_stream")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet
      assert(rows == Set(
        ("2026-01-01 10:00:00.0", 1L), ("2026-01-01 10:05:00.0", 1L)))
    } finally q.stop()
  }

  test("empty snapshots contribute nothing; country counts keyed separately") {
    val t = "2026-01-01 10:00:10"
    val snaps = Seq(
      (UserAddress(u1, Seq()), t),
      (UserAddress(u1, Seq(addr("a1", "S1"))), t))
    val state = WindowCounts.countByState(snapshotsDf(snaps)).collect()
    val country = WindowCounts.countByCountry(snapshotsDf(snaps)).collect()
    assert(state.map(r => (r.getString(1), r.getLong(2))).toSeq == Seq(("S1", 1)))
    assert(country.map(r => (r.getString(1), r.getLong(2))).toSeq == Seq(("C-S1", 1)))
  }
}

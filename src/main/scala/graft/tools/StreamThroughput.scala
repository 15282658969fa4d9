package graft.tools

import graft.core.Schemas
import graft.operators.{EnrichmentJoinTws, Envelope}
import graft.sources.{FileIngestSource, FixtureGenerator}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming throughput probe for the J1 path: N generated wire messages →
  * file source → JSON parse → transformWithState enrichment join (RocksDB
  * state store) → counted sink. Prints wall-clock and messages/sec.
  *
  * Context for the number: the reference's producer emits 40 Kafka messages
  * per run total (`user-generator.py`, BASELINE.md) with a parallelism-1
  * aggregation downstream, so any sustained five-digit msg/s figure here is
  * orders of magnitude beyond the reference's demonstrated scale — the
  * interesting part is that throughput comes from a keyed, fully parallel,
  * checkpointable operator that a real cluster scales horizontally.
  */
object StreamThroughput {
  def main(args: Array[String]): Unit = {
    val nUsers = args.headOption.map(_.toInt).getOrElse(50000)
    val addressesPerUser = 3
    val dir = java.nio.file.Files.createTempDirectory("graft-throughput").toString
    FixtureGenerator.writeFiles(dir, seed = 42L, nUsers = nUsers,
      addressesPerUser = addressesPerUser)
    val nMessages = nUsers * (1 + addressesPerUser)

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val source = new FileIngestSource(dir, streaming = true)
    val users = Schemas.parseUsers(source.users(spark)).map(Envelope.ofUser(_, 0L))
    val addrs = Schemas.parseAddresses(source.addresses(spark)).map(Envelope.ofAddress(_, 1L))
    val snapshots = EnrichmentJoinTws.joinStream(spark, users.unionByName(addrs))

    val t0 = System.nanoTime()
    val q = snapshots.toDF()
      .select(col("user.id").as("userId"), size(col("addresses")).as("n"))
      .writeStream.format("memory").queryName("tp")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(600000)
    val secs = (System.nanoTime() - t0) / 1e9
    val emissions = spark.sql("SELECT COUNT(*) FROM tp").collect().head.getLong(0)
    println(f"THROUGHPUT messages=$nMessages emissions=$emissions wall=$secs%.1fs " +
      f"rate=${nMessages / secs}%.0f msg/s")
    spark.stop()
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SRC1/SRC2: raw record sources for the `user` and `address` streams
  * (`/root/reference/src/main/java/Main.java:51-71`).
  *
  * Each returns a streaming (or batch, for tests) DataFrame with a string
  * `value` column carrying the wire JSON — the same value-only shape the
  * reference's Kafka deserializers consume. Kafka itself is unreachable in
  * this sandbox, so the Kafka impl is configuration-only behind the same
  * trait; file and memory impls drive tests.
  */
trait IngestSource {
  def users(spark: SparkSession): DataFrame
  def addresses(spark: SparkSession): DataFrame
}

/** Kafka source, value-only, earliest offsets — mirrors
  * `Main.java:51-67` (topics `user` / `address`, `earliest`, value
  * deserialization only). Partition discovery is automatic per micro-batch
  * in Spark; consumer-group management is internal to Spark's Kafka source.
  *
  * Requires `spark-sql-kafka-0-10` on the classpath (not present in this
  * zero-egress sandbox, so this impl is configuration-only here; the file
  * and memory sources drive all local testing through the same trait).
  */
final class KafkaIngestSource(
    bootstrapServers: String,
    userTopic: String = "user",
    addressTopic: String = "address") extends IngestSource {

  private def topic(spark: SparkSession, t: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", t)
      .option("startingOffsets", "earliest")
      .load()
      .selectExpr("CAST(value AS STRING) AS value")

  override def users(spark: SparkSession): DataFrame = topic(spark, userTopic)
  override def addresses(spark: SparkSession): DataFrame = topic(spark, addressTopic)
}

/** Newline-delimited JSON files under `<dir>/user` and `<dir>/address`;
  * streaming file source for local end-to-end runs.
  */
final class FileIngestSource(dir: String, streaming: Boolean = true) extends IngestSource {
  private def read(spark: SparkSession, sub: String): DataFrame = {
    val path = s"$dir/$sub"
    val df = if (streaming) spark.readStream.textFile(path).toDF("value")
             else spark.read.textFile(path).toDF("value")
    df
  }
  override def users(spark: SparkSession): DataFrame = read(spark, "user")
  override def addresses(spark: SparkSession): DataFrame = read(spark, "address")
}

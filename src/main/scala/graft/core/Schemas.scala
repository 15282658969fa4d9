package graft.core

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Record types of the reference's data model.
  *
  * Mirrors `/root/reference/src/main/java/Dto/User.java:6-12` and
  * `Dto/Address.java:5-12`: flat string records plus one timestamp; the
  * composite `UserAddress` (`Dto/UserAddress.java:7-9`) nests the user and an
  * append-ordered address list.
  */
final case class User(
    id: String,
    name: String,
    email: String,
    genre: String,
    registerDate: java.sql.Timestamp)

final case class Address(
    userId: String,
    address: String,
    city: String,
    state: String,
    zipCode: String,
    country: String)

final case class UserAddress(user: User, addresses: Seq[Address])

object Schemas {

  /** Wire timestamp format of the reference producer
    * (`/root/reference/user-generator.py:22`): ISO-8601 with microseconds and
    * a no-colon UTC offset, e.g. `2026-08-12T14:03:21.123456+0000`.
    */
  val WireTimestampFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSZ"

  val userSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("email", StringType),
    StructField("genre", StringType),
    StructField("registerDate", TimestampType)))

  val addressSchema: StructType = StructType(Seq(
    StructField("userId", StringType),
    StructField("address", StringType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("zipCode", StringType),
    StructField("country", StringType)))

  private def jsonOptions(strict: Boolean): Map[String, String] = Map(
    "timestampFormat" -> WireTimestampFormat,
    // PERMISSIVE (null-on-missing) matches Jackson's missing-field default in
    // the reference deserializers; FAILFAST matches Jackson's throw-on-garbage.
    "mode" -> (if (strict) "FAILFAST" else "PERMISSIVE"))

  /** D1: JSON `value` column → typed users
    * (`/root/reference/src/main/java/Deserializer/UserDeserializationSchema.java:11-25`).
    */
  def parseUsers(raw: DataFrame, valueCol: String = "value", strict: Boolean = false): Dataset[User] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw
      .select(from_json(col(valueCol).cast("string"), userSchema, jsonOptions(strict)).as("r"))
      .select("r.*")
      .as[User]
  }

  /** D2: JSON `value` column → typed addresses
    * (`/root/reference/src/main/java/Deserializer/AddressDeserializationSchema.java:11-25`).
    */
  def parseAddresses(raw: DataFrame, valueCol: String = "value", strict: Boolean = false): Dataset[Address] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw
      .select(from_json(col(valueCol).cast("string"), addressSchema, jsonOptions(strict)).as("r"))
      .select("r.*")
      .as[Address]
  }

  /** WM analog: the reference is a pure processing-time job
    * (`WatermarkStrategy.noWatermarks()`, `Main.java:70-71`); stamp an ingest
    * processing-time column instead of declaring an event-time watermark.
    */
  def stampProcTime(df: DataFrame, colName: String = "procTime"): DataFrame =
    df.withColumn(colName, current_timestamp())
}

/** Loaders for the driver-generated test corpus (TESTDATA.md). */
object Tables {
  /** Schema cache keyed by the file set's (name, size, mtime) signature:
    * `spark.read.parquet` runs a footer-inference JOB on every call
    * (~65 ms measured warm), and a bench pass calls [[load]] hundreds of
    * times over immutable fixtures — the catalog role a production
    * deployment fills with a metastore. METADATA only (a StructType),
    * never data; the signature invalidates the entry if a path is
    * rewritten (tests do), and non-local paths skip the cache entirely.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  private def fileSig(path: String): Option[String] = {
    val f = new java.io.File(path)
    if (f.isFile) Some(s"$path|${f.length}|${f.lastModified}")
    else if (f.isDirectory) {
      val kids = f.listFiles()
      if (kids == null) None
      else Some(path + "|" + kids.iterator
        .map(c => s"${c.getName}:${c.length}:${c.lastModified}")
        .toSeq.sorted.mkString(","))
    } else None
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    fileSig(path) match {
      case Some(sig) =>
        val sch = schemaCache.computeIfAbsent(sig,
          _ => spark.read.parquet(path).schema)
        spark.read.schema(sch).parquet(path)
      case None => spark.read.parquet(path)
    }
  }

  /** `events.parquet` carries nanosecond parquet timestamps, which Spark's
    * vectorized reader rejects; read them as raw nanos and derive usable
    * epoch columns. Keeps the scan column-pruned and filter-pushable.
    */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, sfDir, "events")
    val tsIsRawNanos = df.schema("ts").dataType == LongType
    // ns-since-epoch (~1.7e18) exceeds double's 2^53 mantissa: all epoch
    // arithmetic must stay integral (DIV), never float division.
    // non-ns files may read as TIMESTAMP or TIMESTAMP_NTZ; normalize via an
    // LTZ cast (session TZ is UTC) before extracting micros
    val nanos =
      if (tsIsRawNanos) col("ts")
      else unix_micros(col("ts").cast("timestamp")) * lit(1000L)
    df.withColumn("ts_ns", nanos)
      .withColumn("epoch_sec", expr("ts_ns DIV 1000000000"))
  }

  def money(c: Column): Column = c.cast(DecimalType(18, 2))
}

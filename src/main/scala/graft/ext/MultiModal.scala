package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines.
  *
  * Media payloads are opaque `binary` columns plus a typed metadata struct —
  * the layout that keeps 100 TB of images/audio scannable: metadata-only
  * queries prune the (huge) binary column at the parquet reader
  * (`ReadSchema` excludes it), and per-record processing is batched per
  * partition, never per-row round-trips.
  *
  * The actual codec work (JPEG decode, audio resample, video frame
  * extraction) requires native libraries that are NOT in this container, so
  * the decode kernels are deliberately STUBBED with deterministic fakes —
  * clearly marked below — while everything Spark-side (schema, partitioning,
  * batch iteration shape, pruning behavior) is real and tested.
  */
object MultiModal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaSchema)))

  /** Build a media table from the documents corpus for testing: the text
    * bytes stand in for an encoded payload. (Real pipelines ingest the
    * binary from object storage; the column shapes are identical.)
    */
  def syntheticMediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"))

  /** Payload size without decoding — pure column arithmetic, prunable. */
  def payloadBytes(payload: Column): Column = octet_length(payload)

  /** ======================== STUB ========================
    * Deterministic fake "decode + feature extraction": an 8-bin byte
    * histogram normalized to [0,1]. A real implementation swaps the body of
    * `fakeDecodeFeatures` for a JNI/native codec call; the partition-batched
    * iteration shape (one reusable "decoder" per partition, records streamed
    * through it) is exactly what a real codec needs and is what this stub
    * exercises.
    */
  def fakeDecodeFeatures(payload: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](8)
    if (payload == null || payload.isEmpty) return bins
    payload.foreach { b => bins((b & 0xFF) >> 5) += 1.0 }
    bins.map(_ / payload.length)
  }

  /** Feature-extract over the media table, batched per partition via
    * mapPartitions (the per-partition setup cost — codec init, model load —
    * amortizes across the partition, the key property at scale).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (STUB: none needed)
        it.map { case (id, payload) => (id, fakeDecodeFeatures(payload)) }
      }
      .toDF("media_id", "features")
    out
  }

  /** ======================== STUB ========================
    * Frame/chunk sampling: slice the payload into `n` evenly spaced chunks
    * of `chunkSize` bytes (a real video impl samples decoded frames; the
    * slicing/batching plumbing is identical). Pure Spark expressions.
    */
  def sampleChunks(media: DataFrame, n: Int = 4, chunkSize: Int = 16): DataFrame = {
    val len = octet_length(col("payload"))
    val idxs = sequence(lit(0), lit(n - 1))
    media.select(
      col("media_id"),
      transform(idxs, i =>
        // substr on binary is positional like on strings (1-based)
        col("payload").substr(
          (i * greatest((len - lit(chunkSize)) / lit(math.max(n - 1, 1)), lit(0)) + lit(1)).cast("int"),
          lit(chunkSize))).as("chunks"))
  }

  /** Metadata-only projection — must NOT read the payload column; the test
    * asserts `ReadSchema` pruning via the physical plan.
    */
  def metadataOnly(mediaPath: String, spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.read.parquet(mediaPath).select(col("media_id"), col("meta.mime"), col("meta.width"))

  /** ======================== STUB ========================
    * Deterministic fake "resize": byte decimation keeping every `factor`-th
    * byte — standing in for an image downscale (a real impl decodes,
    * rescales, re-encodes in this kernel). Output length is
    * ceil(len / factor), the size contract a real downscale also obeys.
    */
  def fakeResize(payload: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    if (payload == null) return Array.emptyByteArray
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }

  /** Resize pass over the media table — same partition-batched
    * `mapPartitions` shape as [[extractFeatures]] (per-partition codec
    * init amortizes; records stream through). Emits the resized payload
    * plus both sizes, the audit columns a media-pipeline run publishes.
    */
  def resizePayloads(media: DataFrame, factor: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here (STUB: none needed)
        it.map { case (id, p) =>
          val r = fakeResize(p, factor)
          (id, r, if (p == null) 0L else p.length.toLong, r.length.toLong)
        }
      }
      .toDF("media_id", "resized", "orig_bytes", "resized_bytes")
  }
}

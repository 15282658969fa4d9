package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
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
  * IMAGE decode is REAL: the JDK ships `javax.imageio` (PNG/JPEG/GIF/BMP)
  * with zero extra dependencies, so [[decodeImageStats]] /
  * [[decodeImageFeatures]] do actual pixel work — dimensions, band count,
  * per-channel means — in the same partition-batched shape a native codec
  * would use, and q134 oracles the round-trip (PNG is lossless, so the
  * decoded stats of a generated image are exactly predictable).
  *
  * AUDIO decode is REAL too: `javax.sound.sampled` ships WAV/AIFF/AU PCM
  * parsing in the JDK, so [[decodeAudioStats]] / [[decodeAudioFeatures]]
  * do actual sample work — format, frame count, per-channel RMS — and
  * q141 oracles the round-trip the same way (16-bit PCM WAV is lossless,
  * so the decoded stats of a generated clip are exactly predictable).
  *
  * VIDEO-SHAPED frame extraction is REAL on the one multi-frame
  * container the JDK ships a codec for: animated GIF.
  * [[decodeFrameStats]] / [[decodeVideoFrames]] discover the frame
  * count from the container and raster-decode every `stride`-th frame —
  * the keyframe-sampling access pattern — and q142 oracles the
  * round-trip (solid-color GIF frames palettize losslessly, so decoded
  * per-frame stats are exactly predictable). An MP4/H.264 deployment
  * swaps the reader inside the same partition-batched kernel for a JNI
  * codec; nothing Spark-side changes.
  *
  * LOSSY RE-ENCODE is REAL: ImageIO also ships a JPEG writer, so
  * [[reencodeJpeg]] / [[jpegReencodeFeatures]] run an actual
  * decode → quality-controlled JPEG encode → decode round-trip; q153
  * grades the codec-exact parts (dims/bands) and pins the lossy part
  * behind a spec-measured tolerance column. Feature extraction
  * ([[extractImageFeatures]]) and frame sampling ([[sampleVideoFrames]])
  * are decode-based too — as of round 12 no verb in this surface stands
  * in for its transform with byte arithmetic; a non-JDK codec (MP4,
  * FLAC, …) swaps into the same partition-batched kernels via JNI with
  * nothing Spark-side changing.
  */
object MultiModal {

  // History: rounds 9-12 flipped ImageIO.setUseCache(false) at each
  // kernel's partition init because the DEFAULT wrapping was a
  // disk-backed temp file per payload (measured 2.7x slower, coupled to
  // /tmp pressure — the q134 drift). Round 13 removed the knob
  // entirely: every codec site now uses the Disposer-free
  // [[ByteArrayImageInputStream]]/[[ByteArrayImageOutputStream]], so no
  // ImageIO-managed stream (cached or not) is ever created and the
  // -Dgraft.imageio.disk.cache escape hatch became a no-op.

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

  /** The id stream every synthetic encoder consumes: the key column as
    * longs, REPARTITIONED to the session default parallelism. The
    * generators stand in for a well-partitioned object-store media scan,
    * but they inherit the KEY table's scan partitioning — and per-row
    * codec cost is orders of magnitude above scan cost, so an
    * unsplittable input (a single-row-group parquet file: the sf0.1
    * fixture, any single-partition source) would serialize the whole
    * encode→decode pipeline on one core (measured: the round-12 replica
    * sweeps ran every media kernel 1-wide of 32). The exchange moves
    * 8-byte ids only — payloads are minted AFTER the shuffle — so the
    * cost is negligible at any scale.
    */
  private def encodeIds(keyed: DataFrame, idCol: String): Dataset[Long] = {
    val spark = keyed.sparkSession
    import spark.implicits._
    keyed.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
  }

  // ------------------------------------------------ real image decode

  /** Decoded-image statistics: dimensions, raster band count, and the
    * per-channel (R, G, B) pixel means.
    */
  final case class ImageStats(width: Int, height: Int, bands: Int,
      meanR: Double, meanG: Double, meanB: Double)

  /** Decode an in-memory payload to a BufferedImage, or null when no
    * registered reader claims it / it is truncated. Equivalent to
    * `ImageIO.read(InputStream)` minus the per-record
    * MemoryCacheImageInputStream, whose constructor takes the JVM-global
    * `sun.java2d.Disposer` monitor (see [[ByteArrayImageInputStream]] —
    * 22/32 executor threads were BLOCKED there in the 100× re-encode
    * kernel). NonFatal, not just IOException: ImageIO plugins throw
    * IllegalArgument/NegativeArraySize/IndexOutOfBounds on truncated or
    * adversarial headers they claimed but cannot parse — any such
    * payload must surface as a decode-failure row, not a dead task.
    */
  private def readImage(payload: Array[Byte]): java.awt.image.BufferedImage =
    try {
      val iis = new ByteArrayImageInputStream(payload)
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) null
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          reader.read(0, reader.getDefaultReadParam)
        } finally reader.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => null }

  /** Encode via an explicit format writer into a fresh byte array —
    * `ImageIO.write(img, fmt, OutputStream)`'s job minus the per-record
    * Disposer-registered cache stream (same rationale as [[readImage]]).
    */
  private def writeImage(img: java.awt.image.BufferedImage,
      format: String): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName(format).next()
    val ios = new ByteArrayImageOutputStream()
    try {
      writer.setOutput(ios)
      writer.write(img)
    } finally writer.dispose()
    ios.toByteArray
  }

  /** REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP —
    * no native libraries needed): width/height, raster band count, and
    * exact per-channel means over every pixel. Returns None for a null,
    * empty, or undecodable payload — the caller keeps such rows visible
    * as decode failures rather than dropping them.
    */
  def decodeImageStats(payload: Array[Byte]): Option[ImageStats] = {
    if (payload == null || payload.isEmpty) None
    else {
      val img = readImage(payload)
      Option(img).map { im =>
        val w = im.getWidth
        val h = im.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        // bulk row fetch with a reused buffer: per-pixel getRGB(x, y)
        // pays a ColorModel conversion + bounds check per call (~10×
        // slower on real images); the bulk path converts a row at a time
        // into the same default sRGB ints, so the sums are identical
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          im.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val p = row(x)
            sr += (p >> 16) & 0xFF
            sg += (p >> 8) & 0xFF
            sb += p & 0xFF
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        ImageStats(w, h, im.getRaster.getNumBands,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
      }
    }
  }

  /** Deterministic PNG encoder for fixtures and the q134 oracle: a solid
    * `(r, g, b)` image of `width`×`height`. PNG is lossless, so a decode
    * of this payload must reproduce the dimensions and color EXACTLY —
    * which is what makes the decode oracle-checkable without a reference
    * image library on the oracle side.
    */
  def encodeSolidPng(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    writeImage(img, "png")
  }

  /** Deterministic PNG media table derived from a keyed table: each id
    * becomes a small solid-color PNG whose dimensions and color are pure
    * functions of the id (width 1+id%7, height 1+id%5, channel c =
    * (id·k_c) mod 256) — so an external oracle predicts the decoded
    * stats from the id alone. The encode runs partition-batched like
    * every media kernel here.
    */
  def syntheticPngMedia(keyed: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = keyed.sparkSession
    import spark.implicits._
    encodeIds(keyed, idCol)
      .mapPartitions { it =>
        it.map { id =>
          val w = (1 + id % 7).toInt
          val h = (1 + id % 5).toInt
          (id, encodeSolidPng(w, h,
            ((id * 37) % 256).toInt, ((id * 59) % 256).toInt,
            ((id * 83) % 256).toInt), w, h)
        }
      }
      .toDF("media_id", "payload", "w", "h")
      .select(col("media_id"), col("payload"),
        struct(lit("image/png").as("mime"),
          col("w").as("width"), col("h").as("height"),
          lit(null).cast(LongType).as("duration_ms")).as("meta"))
  }

  /** REAL decode pass over a media table — the formerly-stubbed half of
    * the multimodal surface: `javax.imageio` pixel decode per record,
    * partition-batched via mapPartitions (readers are created inside the
    * partition — `ImageIO` plugin lookup and buffer reuse amortize the
    * way a native codec's init would). Undecodable payloads yield null
    * stats columns, keeping failures auditable. Output: (media_id,
    * width, height, bands, mean_r, mean_g, mean_b).
    */
  def decodeImageFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          decodeImageStats(payload) match {
            case Some(s) => (id, Some(s.width), Some(s.height), Some(s.bands),
              Some(s.meanR), Some(s.meanG), Some(s.meanB))
            case None => (id, Option.empty[Int], Option.empty[Int],
              Option.empty[Int], Option.empty[Double], Option.empty[Double],
              Option.empty[Double])
          }
        }
      }
      .toDF("media_id", "width", "height", "bands",
        "mean_r", "mean_g", "mean_b")
  }

  // ------------------------------------------------ real audio decode

  /** Decoded-audio statistics: format plus per-channel RMS amplitude
    * (root-mean-square over the clip's 16-bit sample values), the
    * loudness/silence signal an audio training-data pipeline filters on.
    */
  final case class AudioStats(channels: Int, sampleRate: Int, frames: Long,
      rms: Array[Double])

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * PCM — no native libraries needed): container parse, format
    * extraction, and per-channel RMS computed by streaming the sample
    * data through ONE reused frame-aligned buffer (the q134 bulk-fetch
    * lesson applied pre-emptively: no per-sample reads, no whole-clip
    * materialization — at 100 TB the clips stream through a fixed-size
    * window). Returns None for a null/empty/unparseable payload or a
    * non-16-bit-PCM encoding, keeping failures auditable rather than
    * fatal.
    */
  /** javax.sound's `AudioSystem` facade routes EVERY
    * getAudioInputStream/write call through
    * `JDK13Services.getProviders` — a static SYNCHRONIZED method that
    * re-walks the ServiceLoader on each call. Per-record calls
    * therefore (a) pay a provider scan per clip and (b) serialize all
    * executor threads on one JVM-global lock: measured on the 100×
    * replica, the 32-wide audio decode ran 2.6× SLOWER than the same
    * kernel single-threaded (135 s vs 52 s for 500k clips). The public
    * SPI (`javax.sound.sampled.spi`) exposes the identical providers;
    * resolve them ONCE per JVM and dispatch directly — same provider
    * order and results, no global lock, no per-clip scan.
    *
    * Two intentional deviations from AudioSystem's resolution, fine for
    * the WAV-only kernels here but worth knowing on exotic hosts:
    * (1) provider-order override properties
    * (`javax.sound.sampled.spi.*` entries in sound.properties) are NOT
    * honored — this is the raw ServiceLoader order, resolved once with
    * the thread-context classloader at first touch; (2) the per-thread
    * MRU short-circuit means a host with multiple providers CLAIMING
    * the same format can decode a clip with a different (equally
    * claiming) provider than AudioSystem's first-match would pick.
    * With the JDK's sole built-in WAV/AU/AIFF readers both concerns
    * are moot.
    */
  private lazy val audioFileReaders
      : List[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala.toList
  }

  private lazy val audioFileWriters
      : List[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .asScala.toList
  }

  /** The provider that decoded this thread's LAST clip, tried first on
    * the next one. Caching the provider list alone is not enough: a
    * probe of the wrong provider can itself be expensive and locked —
    * the JDK's `SoftMidiAudioFileReader.getAudioInputStream` routes
    * through `MidiSystem.getProviders` → the same JVM-global
    * `JDK13Services` monitor, and a thread dump of the 32-wide WAV
    * decode showed 31 threads parked on that lock just to have the MIDI
    * reader REJECT each clip. Media streams are near-uniform in format,
    * so MRU dispatch sends every clip after a thread's first straight
    * to the right provider — no cross-subsystem probes, no global lock.
    */
  private val lastAudioReader =
    new ThreadLocal[javax.sound.sampled.spi.AudioFileReader]

  /** [[java.io.InputStream]] must be repositioned between provider
    * attempts (AudioSystem does the same mark/reset dance); the payload
    * streams here are ByteArrayInputStreams, which always support it.
    */
  private def openAudioStream(
      in: java.io.InputStream): javax.sound.sampled.AudioInputStream = {
    in.mark(Int.MaxValue)
    def attempt(r: javax.sound.sampled.spi.AudioFileReader)
        : javax.sound.sampled.AudioInputStream =
      try r.getAudioInputStream(in)
      catch {
        case scala.util.control.NonFatal(_) =>
          in.reset() // ByteArrayInputStream: cannot fail
          null
      }
    val mru = lastAudioReader.get()
    if (mru != null) {
      val got = attempt(mru)
      if (got != null) return got
    }
    val it = audioFileReaders.iterator
    while (it.hasNext) {
      val reader = it.next()
      if (reader ne mru) {
        val got = attempt(reader)
        if (got != null) { lastAudioReader.set(reader); return got }
      }
    }
    null
  }

  def decodeAudioStats(payload: Array[Byte]): Option[AudioStats] = {
    import javax.sound.sampled.AudioFormat
    if (payload == null || payload.isEmpty) None
    else {
      val ais = openAudioStream(new java.io.ByteArrayInputStream(payload))
      if (ais == null) None
      else try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) None
        else {
          val channels = fmt.getChannels
          val frameSize = fmt.getFrameSize // = channels * 2 for 16-bit PCM
          val big = fmt.isBigEndian
          // AudioInputStream.read returns an integral number of frames;
          // the buffer is frame-aligned so a channel never splits reads
          val buf = new Array[Byte](8192 - 8192 % frameSize)
          val sumSq = new Array[Long](channels)
          var frames = 0L
          var n = ais.read(buf)
          while (n > 0) {
            var i = 0
            while (i < n) {
              var ch = 0
              while (ch < channels) {
                val o = i + ch * 2
                val s =
                  if (big) ((buf(o) << 8) | (buf(o + 1) & 0xFF)).toShort
                  else ((buf(o + 1) << 8) | (buf(o) & 0xFF)).toShort
                sumSq(ch) += s.toLong * s
                ch += 1
              }
              i += frameSize
            }
            frames += n / frameSize
            n = ais.read(buf)
          }
          if (frames == 0L) None
          else Some(AudioStats(channels, fmt.getSampleRate.toInt, frames,
            sumSq.map(ss => math.sqrt(ss.toDouble / frames))))
        }
      } finally ais.close()
    }
  }

  /** Deterministic 16-bit PCM WAV encoder for fixtures and the q141
    * oracle: `samples` are frame-interleaved (`frames * channels`
    * values). 16-bit PCM is lossless, so a decode of this payload must
    * reproduce every sample value exactly — which is what makes the
    * decode oracle-checkable without an audio library on the oracle
    * side.
    */
  def encodePcmWav(channels: Int, sampleRate: Int,
      samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
    require(channels >= 1 && samples.length % channels == 0,
      s"samples (${samples.length}) must be a whole number of $channels-channel frames")
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) { // WAV PCM is little-endian
      data(2 * i) = (samples(i) & 0xFF).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels,
      /* signed = */ true, /* bigEndian = */ false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data),
      fmt, samples.length.toLong / channels)
    val bos = new java.io.ByteArrayOutputStream()
    // direct SPI dispatch — see [[audioFileReaders]]: AudioSystem.write
    // takes the same JVM-global synchronized provider scan per clip
    audioFileWriters
      .find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE, ais))
      .getOrElse(sys.error("no WAVE AudioFileWriter provider"))
      .write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic WAV media table derived from a keyed table: each id
    * becomes a short PCM clip whose format and samples are pure functions
    * of the id — channels `1 + id%2`, sample rate `8000·(1 + id%3)`,
    * `50 + id%101` frames, sample value
    * `((id·31 + ch·17 + k·7) mod 2001) − 1000` for frame k — so an
    * external oracle predicts the decoded per-channel RMS from the id
    * alone (integer sample values ⇒ the sum of squares is exact in both
    * engines; sqrt/round are IEEE-identical). Encode runs
    * partition-batched like every media kernel here.
    */
  def syntheticWavMedia(keyed: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = keyed.sparkSession
    import spark.implicits._
    encodeIds(keyed, idCol)
      .mapPartitions { it =>
        it.map { id =>
          val channels = (1 + id % 2).toInt
          val rate = (8000 * (1 + id % 3)).toInt
          val frames = (50 + id % 101).toInt
          val samples = new Array[Short](frames * channels)
          var k = 0
          while (k < frames) {
            var ch = 0
            while (ch < channels) {
              samples(k * channels + ch) =
                ((id * 31 + ch * 17 + k * 7) % 2001 - 1000).toShort
              ch += 1
            }
            k += 1
          }
          (id, encodePcmWav(channels, rate, samples),
            frames.toLong * 1000 / rate)
        }
      }
      .toDF("media_id", "payload", "dur")
      .select(col("media_id"), col("payload"),
        struct(lit("audio/wav").as("mime"),
          lit(null).cast(IntegerType).as("width"),
          lit(null).cast(IntegerType).as("height"),
          col("dur").as("duration_ms")).as("meta"))
  }

  /** REAL audio decode pass over a media table — `javax.sound.sampled`
    * PCM parse per record, partition-batched via mapPartitions (parser
    * lookup and the frame buffer amortize per partition the way a native
    * codec's init would). Output is one row per (media, channel) —
    * (media_id, channel, channels, sample_rate, frames, rms) — so
    * variable channel counts need no nullable per-channel columns;
    * undecodable payloads simply emit no rows for that id and are
    * auditable as an anti-join against the input.
    */
  def decodeAudioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          decodeAudioStats(payload).iterator.flatMap { s =>
            s.rms.iterator.zipWithIndex.map { case (r, ch) =>
              (id, ch, s.channels, s.sampleRate, s.frames, r)
            }
          }
        }
      }
      .toDF("media_id", "channel", "channels", "sample_rate", "frames", "rms")
      .withColumn("rms", round(col("rms"), 6))
  }

  // ------------------------------------- real multi-frame (video) decode

  /** Per-frame statistics of a decoded multi-frame media payload. */
  final case class FrameStats(frameIdx: Int, width: Int, height: Int,
      meanR: Double, meanG: Double, meanB: Double)

  /** REAL multi-frame decode via the JDK's `javax.imageio` GIF reader —
    * the video-shaped half of the multimodal surface on a container the
    * JDK actually ships a codec for: an animated GIF is a genuine
    * multi-frame temporal medium (per-frame raster decode, frame count
    * discovered from the container), and frame SAMPLING — decode every
    * `stride`-th frame, skip the rest — is the exact access pattern a
    * video pipeline runs over keyframes. Returns the sampled frames'
    * dimensions and per-channel means; None for null/empty/non-GIF
    * payloads (auditable, not fatal). An MP4/H.264 deployment swaps the
    * reader inside this same partition-batched kernel for a JNI codec;
    * nothing Spark-side changes.
    */
  def decodeFrameStats(payload: Array[Byte], stride: Int = 1): Option[Seq[FrameStats]] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    withFrameReader(payload) { (reader, n) =>
      val out = Vector.newBuilder[FrameStats]
      var f = 0
      while (f < n) {
        if (f % stride == 0) out += frameStatsOf(reader, f)
        f += 1
      }
      out.result()
    }.filter(_.nonEmpty)
  }

  /** Open a multi-frame ImageIO reader over the payload, discover the
    * container's frame count, run `body(reader, n)` — the shared decode
    * scaffolding of [[decodeFrameStats]] and [[decodeSampledFrameStats]].
    * None for null/empty/unreadable payloads or a body that throws
    * (decode failures stay auditable rows, never dead tasks).
    */
  private def withFrameReader[A](payload: Array[Byte])(
      body: (javax.imageio.ImageReader, Int) => A): Option[A] = {
    if (payload == null || payload.isEmpty) None
    else {
      try {
        // Disposer-free stream — see [[readImage]]
        val iis = new ByteArrayImageInputStream(payload)
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); None }
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            // allowSearch: the frame count comes from the container
            Some(body(reader, reader.getNumImages(true)))
          } finally { reader.dispose(); iis.close() }
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Raster-decode one frame and compute its stats (bulk row fetch with
    * a reused buffer — the q134 lesson; per-pixel getRGB pays a
    * ColorModel conversion per call).
    */
  private def frameStatsOf(reader: javax.imageio.ImageReader,
      f: Int): FrameStats = {
    val im = reader.read(f)
    val w = im.getWidth; val h = im.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      im.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val p = row(x)
        sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
        x += 1
      }
      y += 1
    }
    val px = w.toLong * h
    FrameStats(f, w, h, sr.toDouble / px, sg.toDouble / px, sb.toDouble / px)
  }

  /** The `n` evenly spaced frame indices over a `total`-frame clip —
    * first and last frame inclusive, integer-exact (idx_i =
    * ⌊i·(total−1)/(n−1)⌋, collapsing duplicates for clips shorter than
    * the sample count), so an external oracle replays the selection
    * with integer division alone.
    */
  def evenFrameIndices(total: Int, n: Int): Seq[Int] = {
    require(n >= 1, s"n must be >= 1, got $n")
    if (total <= 0) Seq.empty
    else if (n == 1) Seq(0)
    else (0 until n).map(i => i * (total - 1) / (n - 1)).distinct
  }

  /** REAL evenly-spaced frame sampling: decode the container's frame
    * count, raster-decode only the [[evenFrameIndices]] frames (first
    * and last always included — the standard thumbnail/preview access
    * pattern, where [[decodeFrameStats]]'s stride is the keyframe
    * pattern), return (total frame count, sampled frames' stats). The
    * non-sampled frames are never rasterized — the whole point at scale.
    */
  def decodeSampledFrameStats(payload: Array[Byte],
      n: Int): Option[(Int, Seq[FrameStats])] =
    withFrameReader(payload) { (reader, total) =>
      (total, evenFrameIndices(total, n).map(frameStatsOf(reader, _)))
    }.filter(_._2.nonEmpty)

  /** Deterministic animated-GIF encoder for fixtures and the q142
    * oracle: `frames` solid-color frames of `width`×`height`, frame f
    * colored by `color(f)`. GIF palettizes losslessly at ≤256 distinct
    * colors per frame — a solid frame is ONE palette entry — so a decode
    * must reproduce every frame's color exactly, which is what makes the
    * multi-frame decode oracle-checkable without a media library on the
    * oracle side.
    */
  def encodeSolidGif(width: Int, height: Int, frames: Int,
      color: Int => (Int, Int, Int)): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    // Disposer-free stream — see [[readImage]]
    val ios = new ByteArrayImageOutputStream()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val (r, g, b) = color(f)
        // hand the writer a PRE-INDEXED frame with an exact palette: the
        // JDK GIF writer preserves an IndexColorModel verbatim, whereas
        // RGB input may be re-quantized through a default palette (which
        // would break the lossless round-trip the oracle relies on).
        // All pixels default to index 0 = the frame's color.
        val icm = new java.awt.image.IndexColorModel(1, 2,
          Array(r.toByte, r.toByte), Array(g.toByte, g.toByte),
          Array(b.toByte, b.toByte))
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_BINARY, icm)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    ios.toByteArray
  }

  /** Deterministic animated-GIF media table derived from a keyed table:
    * each id becomes a short clip whose frame count, dimensions, and
    * per-frame colors are pure functions of the id — `2 + id%4` frames,
    * width `1 + id%7`, height `1 + id%5`, frame f's channels
    * `((id·37 + f·11) mod 256, (id·59 + f·23) mod 256,
    * (id·83 + f·31) mod 256)` — so an external oracle predicts every
    * sampled frame's decoded stats from (id, f) alone.
    */
  def syntheticGifMedia(keyed: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = keyed.sparkSession
    import spark.implicits._
    encodeIds(keyed, idCol)
      .mapPartitions { it =>
        it.map { id =>
          val w = (1 + id % 7).toInt
          val h = (1 + id % 5).toInt
          val frames = (2 + id % 4).toInt
          (id, encodeSolidGif(w, h, frames, f => (
            ((id * 37 + f * 11) % 256).toInt,
            ((id * 59 + f * 23) % 256).toInt,
            ((id * 83 + f * 31) % 256).toInt)),
            frames.toLong * 100)
        }
      }
      .toDF("media_id", "payload", "dur")
      .select(col("media_id"), col("payload"),
        struct(lit("image/gif").as("mime"),
          lit(null).cast(IntegerType).as("width"),
          lit(null).cast(IntegerType).as("height"),
          col("dur").as("duration_ms")).as("meta"))
  }

  /** REAL frame-sampling decode pass over a media table: every
    * `stride`-th frame of each clip is raster-decoded
    * (partition-batched; reader init and row buffer amortize per
    * partition). Output is one row per sampled frame — (media_id,
    * frame_idx, n_frames_sampled, width, height, mean_r, mean_g,
    * mean_b); undecodable payloads emit no rows and are auditable as an
    * anti-join against the input.
    */
  def decodeVideoFrames(media: DataFrame, stride: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          decodeFrameStats(payload, stride).iterator.flatMap { fs =>
            fs.iterator.map(s => (id, s.frameIdx, fs.size, s.width, s.height,
              s.meanR, s.meanG, s.meanB))
          }
        }
      }
      .toDF("media_id", "frame_idx", "n_frames_sampled", "width", "height",
        "mean_r", "mean_g", "mean_b")
  }

  /** REAL decode-based feature extraction (the round-12 replacement of
    * the last byte-histogram stand-in): decode the image and emit a
    * compact dense feature vector — [width, height, bands, meanR/255,
    * meanG/255, meanB/255] (`array<double>`, channel means normalized
    * to [0, 1] the way a vision model's preprocessing would). Batched
    * per partition via mapPartitions — per-partition setup (codec init,
    * model load) amortizes across the partition, the key property at
    * scale; a learned feature extractor swaps into the same kernel via
    * JNI/ONNX with the schema and batching unchanged. Undecodable
    * payloads emit no rows (auditable by anti-join).
    */
  def extractImageFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          decodeImageStats(payload).map(s => (id, Array(
            s.width.toDouble, s.height.toDouble, s.bands.toDouble,
            s.meanR / 255.0, s.meanG / 255.0, s.meanB / 255.0)))
        }
      }
      .toDF("media_id", "features")
  }

  /** REAL evenly-spaced frame sampling over a media table (the round-12
    * replacement of the byte-slice chunk sampler): for each clip, the
    * container frame count plus one row per [[evenFrameIndices]]-sampled
    * decoded frame — (media_id, n_frames, frame_idx, width, height,
    * mean_r, mean_g, mean_b). Partition-batched; only sampled frames
    * are rasterized; undecodable payloads emit no rows (auditable by
    * anti-join). Complements [[decodeVideoFrames]]: stride sampling is
    * the keyframe pattern, even-index sampling the fixed-budget
    * preview/thumbnail pattern.
    */
  def sampleVideoFrames(media: DataFrame, n: Int = 4): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          decodeSampledFrameStats(payload, n).iterator.flatMap {
            case (total, fs) =>
              fs.iterator.map(s => (id, total, s.frameIdx, s.width, s.height,
                s.meanR, s.meanG, s.meanB))
          }
        }
      }
      .toDF("media_id", "n_frames", "frame_idx", "width", "height",
        "mean_r", "mean_g", "mean_b")
  }

  /** Metadata-only projection — must NOT read the payload column; the test
    * asserts `ReadSchema` pruning via the physical plan.
    */
  def metadataOnly(mediaPath: String, spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.read.parquet(mediaPath).select(col("media_id"), col("meta.mime"), col("meta.width"))

  // ---------------------------------------------- real image resize

  /** REAL image downscale via the JDK raster pipeline: decode
    * (`javax.imageio`), scale to (⌈w/factor⌉, ⌈h/factor⌉) with
    * nearest-neighbor resampling (deterministic — no interpolation
    * weights to drift across platforms), re-encode as PNG. Returns None
    * for undecodable payloads. The ceil contract means a 1×1 image is a
    * fixed point at any factor.
    */
  def resizeImage(payload: Array[Byte], factor: Int): Option[Array[Byte]] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    if (payload == null || payload.isEmpty) None
    else {
      val img = readImage(payload)
      Option(img).map { im =>
        val w = im.getWidth
        val h = im.getHeight
        val w2 = (w + factor - 1) / factor
        val h2 = (h + factor - 1) / factor
        val out = new java.awt.image.BufferedImage(w2, h2,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        // nearest-neighbor via raster ops, not Graphics2D.drawImage:
        // creating a Graphics context instantiates SurfaceData whose
        // manager registers with the JVM-global sun.java2d.Disposer
        // monitor per image (the same lock [[readImage]] avoids).
        // Source sample for dest x = floor(x · w / w2) — the standard
        // forward NN mapping, identical output on every image whose
        // pixels are constant within the factor×factor cells (all the
        // oracle fixtures) and a legitimate NN sample on any other.
        // Index products in Long: y·h / x·w overflow Int past ~46k-px
        // dimensions, and a negative index would kill the task instead
        // of surfacing a decode-failure row.
        val srcRow = new Array[Int](w)
        val dstRow = new Array[Int](w2)
        var y = 0
        while (y < h2) {
          im.getRGB(0, math.min(h - 1, (y.toLong * h / h2).toInt),
            w, 1, srcRow, 0, w)
          var x = 0
          while (x < w2) {
            dstRow(x) = srcRow(math.min(w - 1, (x.toLong * w / w2).toInt))
            x += 1
          }
          out.setRGB(0, y, w2, 1, dstRow, 0, w2)
          y += 1
        }
        writeImage(out, "png")
      }
    }
  }

  /** REAL resize pass over an image media table — decode → raster
    * downscale → PNG re-encode per record, partition-batched, then the
    * decoded stats OF THE RESIZED payload (the audit columns proving the
    * resize did what it claims): (media_id, width, height, bands,
    * mean_r, mean_g, mean_b, orig_bytes, resized_bytes). Undecodable
    * payloads emit no rows (auditable by anti-join).
    */
  def resizeImageFeatures(media: DataFrame, factor: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          for {
            resized <- resizeImage(payload, factor)
            s <- decodeImageStats(resized)
          } yield (id, s.width, s.height, s.bands, s.meanR, s.meanG, s.meanB,
            payload.length.toLong, resized.length.toLong)
        }
      }
      .toDF("media_id", "width", "height", "bands",
        "mean_r", "mean_g", "mean_b", "orig_bytes", "resized_bytes")
  }

  // ------------------------------------------------ real lossy re-encode

  /** REAL lossy JPEG re-encode: decode, redraw onto an RGB raster (the
    * JDK JPEG writer takes no alpha), and re-encode through
    * `javax.imageio`'s JPEG writer at an EXPLICIT `quality` factor — the
    * storage-tiering transform a media pipeline runs on archival tiers
    * (PNG masters → JPEG serving copies). Returns None for
    * null/empty/undecodable payloads, keeping failures auditable.
    */
  def reencodeJpeg(payload: Array[Byte],
      quality: Float = 0.75f): Option[Array[Byte]] = {
    require(quality > 0f && quality <= 1f,
      s"quality must be in (0, 1], got $quality")
    if (payload == null || payload.isEmpty) None
    else {
      val img = readImage(payload)
      Option(img).map { im =>
        val rgb =
          if (im.getType == java.awt.image.BufferedImage.TYPE_INT_RGB) im
          else {
            val w = im.getWidth
            val h = im.getHeight
            val t = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            // row-bulk sRGB copy, not Graphics2D.drawImage — a Graphics
            // context would register SurfaceData with the JVM-global
            // sun.java2d.Disposer monitor per record (see [[readImage]]).
            // getRGB routes through the same default-sRGB ColorModel
            // conversion drawImage used; translucent pixels are
            // SRC_OVER-composited onto opaque black here (channel ·
            // alpha/255), preserving the replaced drawImage-onto-RGB
            // semantics for ARGB sources — a raw copy would let fully
            // transparent pixels keep their stored RGB
            val hasAlpha = im.getColorModel.hasAlpha
            val row = new Array[Int](w)
            var y = 0
            while (y < h) {
              im.getRGB(0, y, w, 1, row, 0, w)
              if (hasAlpha) {
                var x = 0
                while (x < w) {
                  val p = row(x)
                  val a = (p >>> 24) & 0xFF
                  if (a != 0xFF) {
                    val r = ((p >> 16) & 0xFF) * a / 255
                    val g = ((p >> 8) & 0xFF) * a / 255
                    val b = (p & 0xFF) * a / 255
                    row(x) = (r << 16) | (g << 8) | b
                  }
                  x += 1
                }
              }
              t.setRGB(0, y, w, 1, row, 0, w)
              y += 1
            }
            t
          }
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("jpeg").next()
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(
          javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(quality)
        // Disposer-free stream — see [[readImage]]
        val ios = new ByteArrayImageOutputStream()
        try {
          writer.setOutput(ios)
          writer.write(null,
            new javax.imageio.IIOImage(rgb, null, null), param)
        } finally writer.dispose()
        ios.toByteArray
      }
    }
  }

  /** Lossy re-encode audit pass — decode → JPEG re-encode → decode THE
    * JPEG, partition-batched like every media kernel here. Lossy output
    * splits into two classes of audit column: the parts the codec
    * contract makes EXACT (dimensions and band count survive any JPEG
    * round-trip) are emitted raw for exact replay, while the lossy part
    * (pixel values) is graded as `within_tol` — max per-channel
    * |mean(jpeg) − mean(original)| ≤ `tol` — because no external oracle
    * can replay a lossy codec's exact output, only bound it. The
    * tolerance is pinned empirically by MultiModalSpec over the full
    * fixture color/dimension period. Byte sizes of both payloads ride
    * along as (non-replayable, deterministic) report columns for the
    * storage-tiering decision the transform exists to inform.
    */
  def jpegReencodeFeatures(media: DataFrame, quality: Float = 0.75f,
      tol: Double = 8.0): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          for {
            orig <- decodeImageStats(payload)
            jpeg <- reencodeJpeg(payload, quality)
            s <- decodeImageStats(jpeg)
          } yield {
            val err = math.max(math.abs(s.meanR - orig.meanR),
              math.max(math.abs(s.meanG - orig.meanG),
                math.abs(s.meanB - orig.meanB)))
            (id, s.width, s.height, s.bands, err <= tol,
              payload.length.toLong, jpeg.length.toLong)
          }
        }
      }
      .toDF("media_id", "width", "height", "bands", "within_tol",
        "orig_bytes", "jpeg_bytes")
  }

}

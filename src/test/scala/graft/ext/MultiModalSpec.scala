package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class MultiModalSpec extends SparkSpecBase {
  import spark.implicits._

  private def media = MultiModal.syntheticMediaFromDocs(
    Seq((0L, "hello world", "en", "s", 11L), (1L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))

  test("media table has the binary+metadata schema") {
    assert(media.schema("payload").dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
  }

  test("decode-based feature extraction is deterministic and normalized") {
    val pngMedia = MultiModal.syntheticPngMedia(
      Seq(0L, 1L, 13L).toDF("doc_id"))
    val f1 = MultiModal.extractImageFeatures(pngMedia).orderBy("media_id")
      .as[(Long, Seq[Double])].collect()
    val f2 = MultiModal.extractImageFeatures(pngMedia).orderBy("media_id")
      .as[(Long, Seq[Double])].collect()
    assert(f1.toSeq == f2.toSeq)
    // [w, h, bands, meanR/255, meanG/255, meanB/255]; channel features
    // normalized to [0, 1] and exact for the solid-color fixture
    assert(f1.forall(_._2.length == 6))
    assert(f1.forall(_._2.drop(3).forall(v => v >= 0.0 && v <= 1.0)))
    val f13 = f1.find(_._1 == 13L).get._2
    assert(f13 == Seq((1 + 13 % 7).toDouble, (1 + 13 % 5).toDouble, 3.0,
      (13 * 37 % 256) / 255.0, (13 * 59 % 256) / 255.0,
      (13 * 83 % 256) / 255.0))
    // undecodable payloads emit no rows (auditable by anti-join)
    assert(MultiModal.extractImageFeatures(media).count() == 0)
  }

  test("even frame sampling decodes first/last-inclusive spaced frames") {
    // index arithmetic: integer-exact, duplicates collapsed on short clips
    assert(MultiModal.evenFrameIndices(5, 4) == Seq(0, 1, 2, 4))
    assert(MultiModal.evenFrameIndices(2, 4) == Seq(0, 1))
    assert(MultiModal.evenFrameIndices(1, 4) == Seq(0))
    assert(MultiModal.evenFrameIndices(9, 1) == Seq(0))
    assert(MultiModal.evenFrameIndices(0, 4) == Seq.empty)
    // distributed pass over the GIF fixture: ids 3 (5 frames) / 1 (3)
    val got = MultiModal.sampleVideoFrames(
        MultiModal.syntheticGifMedia(Seq(3L, 1L).toDF("doc_id")), n = 4)
      .as[(Long, Int, Int, Int, Int, Double, Double, Double)]
      .collect().groupBy(_._1)
    val id3 = got(3L).sortBy(_._3)
    assert(id3.map(_._3).toSeq == Seq(0, 1, 2, 4)) // frame indices
    assert(id3.forall(r => r._2 == 5 && r._4 == 1 + 3 % 7 && r._5 == 1 + 3 % 5))
    // solid frames round-trip their exact per-frame colors
    assert(id3.map(r => (r._6, r._7, r._8)).toSeq ==
      Seq(0, 1, 2, 4).map(f => (((3 * 37 + f * 11) % 256).toDouble,
        ((3 * 59 + f * 23) % 256).toDouble, ((3 * 83 + f * 31) % 256).toDouble)))
    assert(got(1L).map(_._3).sorted.toSeq == Seq(0, 1, 2)) // 3 frames, all
    // non-GIF payloads emit no rows
    assert(MultiModal.sampleVideoFrames(media).count() == 0)
  }

  test("metadata-only scan prunes the payload column (ReadSchema)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").parquet(dir)
    val proj = MultiModal.metadataOnly(dir, spark)
    val physical = proj.queryExecution.executedPlan.toString
    assert(physical.contains("media_id"))
    assert(!physical.contains("payload"), s"payload not pruned:\n$physical")
  }

  test("REAL ImageIO decode round-trips generated PNGs exactly") {
    // direct kernel round-trip: encode a known image, decode its stats
    val png = MultiModal.encodeSolidPng(6, 4, 200, 10, 99)
    assert(png.length > 8 &&
      (png(1) & 0xFF) == 'P'.toInt && (png(2) & 0xFF) == 'N'.toInt,
      "payload is a real PNG container")
    val s = MultiModal.decodeImageStats(png).get
    assert(s == MultiModal.ImageStats(6, 4, 3, 200.0, 10.0, 99.0))
    // distributed pass over an id-derived media table
    val ids = Seq(0L, 1L, 13L, 299L).toDF("doc_id")
    val got = MultiModal.decodeImageFeatures(MultiModal.syntheticPngMedia(ids))
      .as[(Long, Option[Int], Option[Int], Option[Int],
        Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    for (id <- Seq(0L, 1L, 13L, 299L)) {
      val (_, w, h, b, mr, mg, mb) = got(id)
      assert(w.get == (1 + id % 7).toInt && h.get == (1 + id % 5).toInt)
      assert(b.get == 3)
      assert(mr.get == ((id * 37) % 256).toDouble &&
        mg.get == ((id * 59) % 256).toDouble &&
        mb.get == ((id * 83) % 256).toDouble)
    }
    // undecodable payloads stay visible as null-stat rows, not dropped
    val bad = Seq((7L, "not an image".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val failed = MultiModal.decodeImageFeatures(bad).collect()
    assert(failed.length == 1 && failed.head.getLong(0) == 7L &&
      failed.head.isNullAt(1) && failed.head.isNullAt(4))
  }

  test("REAL audio decode round-trips generated PCM WAVs exactly") {
    // direct kernel round-trip: known interleaved stereo samples
    val samples = Array[Short](100, -200, 300, -400, 500, -600) // 3 frames x 2ch
    val wav = MultiModal.encodePcmWav(2, 16000, samples)
    assert(wav.length > 44 && new String(wav.take(4)) == "RIFF" &&
      new String(wav.slice(8, 12)) == "WAVE", "payload is a real WAV container")
    val s = MultiModal.decodeAudioStats(wav).get
    assert(s.channels == 2 && s.sampleRate == 16000 && s.frames == 3L)
    // RMS per channel over the exact integer samples
    def rms(vs: Seq[Int]) = math.sqrt(vs.map(v => v.toLong * v).sum.toDouble / vs.length)
    assert(s.rms(0) == rms(Seq(100, 300, 500)))
    assert(s.rms(1) == rms(Seq(-200, -400, -600)))
    // distributed pass over an id-derived media table: one row per
    // (media, channel), format and RMS matching the closed-form fixture
    val ids = Seq(0L, 1L, 13L, 299L).toDF("doc_id")
    val got = MultiModal.decodeAudioFeatures(MultiModal.syntheticWavMedia(ids))
      .as[(Long, Int, Int, Int, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got.size == Seq(0L, 1L, 13L, 299L).map(id => 1 + id % 2).sum)
    for (id <- Seq(0L, 1L, 13L, 299L); ch <- 0 until (1 + id % 2).toInt) {
      val (_, _, channels, rate, frames, r) = got((id, ch))
      assert(channels == (1 + id % 2).toInt && rate == (8000 * (1 + id % 3)).toInt)
      assert(frames == 50 + id % 101)
      val expect = rms((0 until frames.toInt).map(k =>
        ((id * 31 + ch * 17 + k * 7) % 2001 - 1000).toInt))
      assert(r == BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // unparseable payloads emit no rows (auditable by anti-join), and a
    // non-PCM claim is rejected rather than mis-decoded
    val bad = Seq((7L, "not audio at all".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    assert(MultiModal.decodeAudioFeatures(bad).collect().isEmpty)
    assert(MultiModal.decodeAudioStats(null).isEmpty)
    assert(MultiModal.decodeAudioStats(Array.emptyByteArray).isEmpty)
  }

  test("REAL multi-frame GIF decode samples frames and round-trips colors exactly") {
    // direct kernel round-trip: 5 frames, distinct solid colors, stride 2
    val gif = MultiModal.encodeSolidGif(4, 3, 5, f => (10 * f, 20 * f, 30 * f))
    assert(new String(gif.take(3)) == "GIF", "payload is a real GIF container")
    val all = MultiModal.decodeFrameStats(gif, stride = 1).get
    assert(all.size == 5)
    val sampled = MultiModal.decodeFrameStats(gif, stride = 2).get
    assert(sampled.map(_.frameIdx) == Seq(0, 2, 4))
    for (s <- sampled) {
      assert(s.width == 4 && s.height == 3)
      assert((s.meanR, s.meanG, s.meanB) ==
        ((10.0 * s.frameIdx, 20.0 * s.frameIdx, 30.0 * s.frameIdx)))
    }
    // distributed pass over an id-derived media table
    val ids = Seq(0L, 1L, 13L, 299L).toDF("doc_id")
    val got = MultiModal.decodeVideoFrames(MultiModal.syntheticGifMedia(ids), stride = 2)
      .as[(Long, Int, Int, Int, Int, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    for (id <- Seq(0L, 1L, 13L, 299L)) {
      val frames = (2 + id % 4).toInt
      val idxs = 0 until frames by 2
      for (f <- idxs) {
        val (_, _, n, w, h, mr, mg, mb) = got((id, f))
        assert(n == idxs.size && w == (1 + id % 7).toInt && h == (1 + id % 5).toInt)
        assert(mr == ((id * 37 + f * 11) % 256).toDouble &&
          mg == ((id * 59 + f * 23) % 256).toDouble &&
          mb == ((id * 83 + f * 31) % 256).toDouble)
      }
      // odd frames were skipped, not decoded
      assert(!(1 until frames by 2).exists(f => got.contains((id, f))))
    }
    // unparseable payloads emit no rows
    val bad = Seq((7L, "not a gif".getBytes("UTF-8"))).toDF("media_id", "payload")
    assert(MultiModal.decodeVideoFrames(bad).collect().isEmpty)
    assert(MultiModal.decodeFrameStats(null).isEmpty)
  }

  test("REAL image resize downscales rasters with the ceil contract and preserves solid color") {
    // direct kernel: 7x5 solid → factor 2 → 4x3, same color, still a PNG
    val png = MultiModal.encodeSolidPng(7, 5, 200, 10, 99)
    val resized = MultiModal.resizeImage(png, 2).get
    val s = MultiModal.decodeImageStats(resized).get
    assert(s == MultiModal.ImageStats(4, 3, 3, 200.0, 10.0, 99.0))
    // 1x1 is a fixed point at any factor
    val tiny = MultiModal.resizeImage(MultiModal.encodeSolidPng(1, 1, 5, 6, 7), 10).get
    assert(MultiModal.decodeImageStats(tiny).get ==
      MultiModal.ImageStats(1, 1, 3, 5.0, 6.0, 7.0))
    // distributed pass: audit columns of the resized payloads
    val ids = Seq(0L, 1L, 13L, 299L).toDF("doc_id")
    val got = MultiModal.resizeImageFeatures(MultiModal.syntheticPngMedia(ids), 2)
      .as[(Long, Int, Int, Int, Double, Double, Double, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    for (id <- Seq(0L, 1L, 13L, 299L)) {
      val (_, w, h, b, mr, mg, mb, ob, rb) = got(id)
      assert(w == ((1 + id % 7).toInt + 1) / 2 && h == ((1 + id % 5).toInt + 1) / 2)
      assert(b == 3 && ob > 0 && rb > 0)
      assert(mr == ((id * 37) % 256).toDouble && mg == ((id * 59) % 256).toDouble &&
        mb == ((id * 83) % 256).toDouble)
    }
    // undecodable payloads emit no rows
    val bad = Seq((7L, "not an image".getBytes("UTF-8"))).toDF("media_id", "payload")
    assert(MultiModal.resizeImageFeatures(bad, 2).collect().isEmpty)
    assert(MultiModal.resizeImage(null, 2).isEmpty)
  }

  test("REAL lossy JPEG re-encode: dims/bands exact, color error bounded over the full fixture period") {
    // dims exact, bands 3, payload really is a JPEG (SOI marker), and the
    // round-trip error of a solid color is small but (being lossy)
    // usually nonzero
    val png = MultiModal.encodeSolidPng(7, 5, 200, 10, 99)
    val jpeg = MultiModal.reencodeJpeg(png).get
    assert((jpeg(0) & 0xFF) == 0xFF && (jpeg(1) & 0xFF) == 0xD8, "missing JPEG SOI marker")
    val s = MultiModal.decodeImageStats(jpeg).get
    assert(s.width == 7 && s.height == 5 && s.bands == 3)
    // THE TOLERANCE PIN: the q153 oracle asserts within_tol = TRUE for
    // every row, which is only sound if tol bounds the JDK JPEG codec's
    // solid-color round-trip error for EVERY (w, h, r, g, b) combination
    // the fixture can produce. The fixture is periodic in the id with
    // period lcm(7, 5, 256) = 8960 (dims mod 7/5, channels mod 256), so
    // sweeping one full period IS an exhaustive proof over the fixture
    // space, not a sample.
    var worst = 0.0
    var id = 0L
    while (id < 8960L) {
      val w = (1 + id % 7).toInt
      val h = (1 + id % 5).toInt
      val (r, g, b) = (((id * 37) % 256).toInt, ((id * 59) % 256).toInt,
        ((id * 83) % 256).toInt)
      val p = MultiModal.encodeSolidPng(w, h, r, g, b)
      val st = MultiModal.decodeImageStats(MultiModal.reencodeJpeg(p).get).get
      assert(st.width == w && st.height == h && st.bands == 3,
        s"id=$id dims/bands not preserved: $st")
      val err = math.max(math.abs(st.meanR - r),
        math.max(math.abs(st.meanG - g), math.abs(st.meanB - b)))
      if (err > worst) worst = err
      id += 1
    }
    info(f"max solid-color JPEG round-trip channel-mean error: $worst%.3f")
    assert(worst <= 8.0, f"fixture-period max error $worst%.3f exceeds " +
      "the q153 tolerance 8.0 — the oracle's within_tol=TRUE is unsound")
    // distributed pass: same contract through the DataFrame kernel
    val ids = Seq(0L, 1L, 13L, 299L).toDF("doc_id")
    val got = MultiModal.jpegReencodeFeatures(MultiModal.syntheticPngMedia(ids))
      .as[(Long, Int, Int, Int, Boolean, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    for (id2 <- Seq(0L, 1L, 13L, 299L)) {
      val (_, w, h, b, ok, ob, jb) = got(id2)
      assert(w == (1 + id2 % 7).toInt && h == (1 + id2 % 5).toInt && b == 3)
      assert(ok, s"id=$id2 outside tolerance")
      assert(ob > 0 && jb > 0)
    }
    // undecodable payloads emit no rows; null payload is None
    val bad = Seq((7L, "not an image".getBytes("UTF-8"))).toDF("media_id", "payload")
    assert(MultiModal.jpegReencodeFeatures(bad).collect().isEmpty)
    assert(MultiModal.reencodeJpeg(null).isEmpty)
  }
}

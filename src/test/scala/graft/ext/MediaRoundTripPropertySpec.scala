package graft.ext

import org.scalacheck.{Gen, Prop, Properties}

/** Property-based pinning of the media encode→decode round-trips over
  * RANDOM payload shapes — the fixed-fixture specs' adversarial sibling.
  * These are pure-JVM kernel properties (no SparkSession): the
  * distributed passes are thin `mapPartitions` wrappers over exactly
  * these functions, already covered by `MultiModalSpec` and the
  * q134/q141/q142/q143 oracles.
  */
object MediaRoundTripPropertySpec extends Properties("MediaRoundTrip") {

  // ---- audio: 16-bit PCM WAV is lossless, so per-channel RMS must be
  // exactly the RMS of the generated samples, and the format fields
  // must survive the container round-trip verbatim
  private val genAudio = for {
    channels <- Gen.choose(1, 4)
    rate <- Gen.oneOf(8000, 11025, 16000, 22050, 44100)
    frames <- Gen.choose(1, 400)
    seed <- Gen.choose(Long.MinValue, Long.MaxValue)
  } yield (channels, rate, frames, seed)

  property("WAV PCM round-trip: format and per-channel RMS exact") =
    Prop.forAll(genAudio) { case (channels, rate, frames, seed) =>
      val rng = new scala.util.Random(seed)
      val samples = Array.fill(frames * channels)(
        (rng.nextInt(65536) - 32768).toShort)
      val wav = MultiModal.encodePcmWav(channels, rate, samples)
      val s = MultiModal.decodeAudioStats(wav).get
      val rmsOk = (0 until channels).forall { ch =>
        val vals = (0 until frames).map(k => samples(k * channels + ch).toLong)
        s.rms(ch) == math.sqrt(vals.map(v => v * v).sum.toDouble / frames)
      }
      s.channels == channels && s.sampleRate == rate &&
        s.frames == frames.toLong && s.rms.length == channels && rmsOk
    }

  // ---- image: solid-color PNG round-trip at arbitrary dims/colors
  private val genImage = for {
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 40)
    r <- Gen.choose(0, 255); g <- Gen.choose(0, 255); b <- Gen.choose(0, 255)
  } yield (w, h, r, g, b)

  property("PNG solid round-trip: dims and channel means exact") =
    Prop.forAll(genImage) { case (w, h, r, g, b) =>
      val s = MultiModal.decodeImageStats(MultiModal.encodeSolidPng(w, h, r, g, b)).get
      s == MultiModal.ImageStats(w, h, 3, r.toDouble, g.toDouble, b.toDouble)
    }

  property("resize: ceil-dims contract and solid color preserved at any factor") =
    Prop.forAll(genImage, Gen.choose(1, 9)) { case ((w, h, r, g, b), f) =>
      val resized = MultiModal.resizeImage(MultiModal.encodeSolidPng(w, h, r, g, b), f).get
      val s = MultiModal.decodeImageStats(resized).get
      s == MultiModal.ImageStats((w + f - 1) / f, (h + f - 1) / f, 3,
        r.toDouble, g.toDouble, b.toDouble)
    }

  // ---- multi-frame GIF: frame count discovery + stride sampling at
  // arbitrary clip shapes; every sampled frame's color exact
  private val genClip = for {
    w <- Gen.choose(1, 20)
    h <- Gen.choose(1, 20)
    frames <- Gen.choose(1, 12)
    stride <- Gen.choose(1, 5)
    seed <- Gen.choose(0, Int.MaxValue)
  } yield (w, h, frames, stride, seed)

  property("GIF multi-frame round-trip: sampled indices and colors exact") =
    Prop.forAll(genClip) { case (w, h, frames, stride, seed) =>
      def color(f: Int) = (
        java.lang.Math.floorMod(seed.toLong * 31 + f * 11, 256L).toInt,
        java.lang.Math.floorMod(seed.toLong * 59 + f * 23, 256L).toInt,
        java.lang.Math.floorMod(seed.toLong * 83 + f * 31, 256L).toInt)
      val gif = MultiModal.encodeSolidGif(w, h, frames, color)
      val fs = MultiModal.decodeFrameStats(gif, stride).get
      val wantIdx = 0 until frames by stride
      fs.map(_.frameIdx) == wantIdx &&
        fs.forall { s =>
          val (r, g, b) = color(s.frameIdx)
          s.width == w && s.height == h &&
            (s.meanR, s.meanG, s.meanB) == ((r.toDouble, g.toDouble, b.toDouble))
        }
    }
}

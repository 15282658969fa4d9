package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpecBase {
  import spark.implicits._

  // Two disjoint-vocabulary "domains": target-like docs draw from A-words,
  // off-domain docs from B-words; a held-out A-like raw pool competes with
  // the B pool for selection. ids 0-99 are the labeled target slice (A),
  // 100-149 unlabeled A-like, 150-249 unlabeled B.
  private val aWords = Vector("alpha", "beta", "gamma", "delta", "epsilon")
  private val bWords = Vector("zeta", "eta", "theta", "iota", "kappa")
  private def text(words: Vector[String], seed: Long): String =
    (0 until 20).map(i => words(((seed * 31 + i * 7) % words.size).toInt.abs))
      .mkString(" ")
  private val docs = (
    (0L until 100L).map(i => (i, text(aWords, i), true)) ++
    (100L until 150L).map(i => (i, text(aWords, i), false)) ++
    (150L until 250L).map(i => (i, text(bWords, i), false))
  ).toDF("doc_id", "text", "is_tgt")

  test("importance weights separate target-like from off-domain docs") {
    val sel = Dsir.resample(docs, col("is_tgt"), k = 60, buckets = 256)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(sel.length == 60)
    // exp(logw) mass concentrates on A-vocabulary docs, so the Gumbel
    // draw should pick overwhelmingly from ids < 150
    val aLike = sel.count(_._1 < 150L)
    assert(aLike >= 55, s"expected >=55 A-like of 60 selected, got $aLike")
    // and the unlabeled A-like pool must outscore the B pool on logw
    val scored = Dsir.resample(docs, col("is_tgt"), k = 250, buckets = 256)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val aMean = (100L until 150L).flatMap(scored.get).sum / 50.0
    val bMean = (150L until 250L).flatMap(scored.get).sum / 100.0
    assert(aMean > bMean + 1.0,
      s"A-like mean logw $aMean should clearly exceed B mean $bMean")
  }

  test("selection is deterministic and repartition-invariant") {
    val a = Dsir.resample(docs, col("is_tgt"), k = 40, buckets = 256)
      .orderBy("doc_id").collect().toSeq
    val b = Dsir.resample(docs.repartition(17), col("is_tgt"), k = 40,
      buckets = 256).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("k caps the selection and sampling is without replacement") {
    val sel = Dsir.resample(docs, col("is_tgt"), k = 25, buckets = 256)
      .select("doc_id").as[Long].collect()
    assert(sel.length == 25 && sel.distinct.length == 25)
  }

  test("scoring a stream against frozen ratios matches the batch scores") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // ratios frozen from the reference corpus (the compute-on-reference /
    // apply-on-stream split); the stream carries a fresh refresh batch
    val ratios = Dsir.bucketLogRatios(
      Dsir.featureBuckets(docs, 256).join(
        docs.select(col("doc_id"), col("is_tgt").as("_is_tgt")), "doc_id"),
      col("_is_tgt"), 256)
    val batch = (300L until 320L)
      .map(i => (i, text(if (i % 2 == 0) aWords else bWords, i)))
    val expected = Dsir.scoreAgainst(batch.toDF("doc_id", "text"), ratios, 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ms = MemoryStream[(Long, String)]
    ms.addData(batch: _*)
    val q = Dsir.scoreAgainst(ms.toDF.toDF("doc_id", "text"), ratios, 256)
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM dsir_stream")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(streamed == expected && expected.size == 20)
    } finally q.stop()
  }

  test("unseen-bucket features score the smoothed ratio instead of dropping the doc") {
    // a tiny reference corpus with few distinct features leaves most of
    // the 256-bucket domain unseen; a refresh doc built from an alien
    // vocabulary hashes (almost surely) entirely off the reference support
    val ref = Seq((0L, "alpha beta", true), (1L, "alpha gamma", false))
      .toDF("doc_id", "text", "is_tgt")
    val feats = Dsir.featureBuckets(ref, 256).join(
      ref.select(col("doc_id"), col("is_tgt").as("_is_tgt")), "doc_id")
    val ratios = Dsir.bucketLogRatios(feats, col("_is_tgt"), 256)
    // the ratio table covers the full domain
    assert(ratios.count() == 256)
    val alien = Seq((900L, "xylophone quark zymurgy")).toDF("doc_id", "text")
    val got = Dsir.scoreAgainst(alien, ratios, 256)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 1, "all-unseen doc must not be dropped")
    // 3 unigrams + 2 bigrams, each scoring the unseen-bucket constant
    // ln(1/(ttot+256)) - ln(1/(rtot+256)); the reference has 3 feature
    // occurrences per doc (2 unigrams + 1 bigram), so rtot=6, ttot=3
    val unseenLr = math.log(1.0 / (3 + 256.0)) - math.log(1.0 / (6 + 256.0))
    assert(math.abs(got.head._2 - 5 * unseenLr) < 1e-9)
  }
}

package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  private val rows = (0L until 4000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
  private val df = rows.toDF("doc_id", "stratum")

  test("stratified sample is deterministic and repartition-invariant") {
    val a = Sampling.stratifiedSample(df, col("stratum"),
      Map("en" -> 0.5), defaultRate = 0.1).select("doc_id").as[Long].collect().sorted
    val b = Sampling.stratifiedSample(df.repartition(13), col("stratum"),
      Map("en" -> 0.5), defaultRate = 0.1).select("doc_id").as[Long].collect().sorted
    assert(a.nonEmpty && a.toSeq == b.toSeq)
  }

  test("exact-k holdout: exact size, determinism, and one-displacement stability") {
    val hold = Sampling.exactKPerStratum(df, col("stratum"), k = 25)
      .select("doc_id").as[Long].collect().toSet
    assert(hold.size == 50) // 25 per stratum, 2 strata
    val again = Sampling.exactKPerStratum(df.repartition(11), col("stratum"),
      k = 25).select("doc_id").as[Long].collect().toSet
    assert(again == hold)
    // growth stability: adding one doc displaces AT MOST one holdout row
    // of its stratum (the defining advantage over rate-based sampling)
    val grown = Sampling.exactKPerStratum(
      df.unionByName(Seq((5000L, "en")).toDF("doc_id", "stratum")),
      col("stratum"), k = 25).select("doc_id").as[Long].collect().toSet
    assert((hold -- grown).size <= 1 && (grown -- hold).size <= 1)
    // small strata keep everything
    val tiny = Sampling.exactKPerStratum(
      Seq((1L, "x"), (2L, "x")).toDF("doc_id", "stratum"),
      col("stratum"), k = 25).count()
    assert(tiny == 2L)
  }

  test("per-stratum keep rates land near their targets") {
    val kept = Sampling.stratifiedSample(df, col("stratum"),
      Map("en" -> 0.5, "de" -> 0.2), defaultRate = 1.0)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    // 2000 ids per stratum; md5 hashes are uniform, so ±0.05 is generous
    assert(math.abs(kept("en") / 2000.0 - 0.5) < 0.05)
    assert(math.abs(kept("de") / 2000.0 - 0.2) < 0.05)
  }

  test("stratified sample runs unchanged on a stream and matches the batch decision") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val sampled = Sampling.stratifiedSample(
      input.toDF().toDF("doc_id", "stratum"), col("stratum"),
      Map("en" -> 0.5, "de" -> 0.2), defaultRate = 1.0)
    val q = sampled.writeStream.format("memory").queryName("strat_stream")
      .outputMode("append").start()
    val streamed =
      try {
        rows.grouped(1000).foreach { chunk => input.addData(chunk); q.processAllAvailable() }
        spark.sql("SELECT doc_id FROM strat_stream").as[Long].collect().toSet
      } finally q.stop()
    val batch = Sampling.stratifiedSample(df, col("stratum"),
      Map("en" -> 0.5, "de" -> 0.2), defaultRate = 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch)
  }

  test("rate 0 keeps nothing, rate 1 keeps everything") {
    assert(Sampling.stratifiedSample(df, col("stratum"),
      Map("en" -> 0.0, "de" -> 0.0), defaultRate = 0.0).count() == 0)
    assert(Sampling.stratifiedSample(df, col("stratum"),
      Map(), defaultRate = 1.0).count() == 4000)
  }

  test("temperature resample: alpha=0 equalizes strata, alpha=1 preserves mix") {
    // skewed corpus: 3000 en, 1000 de
    val skew = ((0L until 3000L).map((_, "en")) ++ (3000L until 4000L).map((_, "de")))
      .toDF("doc_id", "stratum")
    // alpha=1: w ∝ cnt so rate = targetFrac for every stratum
    val asIs = Sampling.temperatureResample(skew, col("stratum"),
      alpha = 1.0, targetFrac = 0.5)
    assert(asIs.select("rate").distinct().as[Double].collect().toSeq == Seq(0.5))
    // alpha=0: w uniform so expected kept volume is equal per stratum
    // (rate_en = 0.5*4000/(2*3000) = 1/3, rate_de = 1.0 capped)
    val eq = Sampling.temperatureResample(skew, col("stratum"),
      alpha = 0.0, targetFrac = 0.5)
    val rates = eq.select("stratum", "rate").distinct()
      .as[(String, Double)].collect().toMap
    assert(rates("en") == 0.333333 && rates("de") == 1.0)
    val kept = eq.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(kept("de") == 1000L) // rate 1.0 keeps everything
    assert(math.abs(kept("en") - 1000L) < 100L) // ~rate 1/3 of 3000
  }

  test("temperature resample keeps null strata as their own group") {
    val df = ((0L until 100L).map(i => (i, "en")) ++
      (100L until 200L).map(i => (i, null.asInstanceOf[String])))
      .toDF("doc_id", "stratum")
    val out = Sampling.temperatureResample(df, col("stratum"),
      alpha = 1.0, targetFrac = 1.0)
    // rate 1.0 everywhere: nothing is dropped, including the null stratum
    assert(out.count() == 200L)
    assert(out.filter(col("stratum").isNull).count() == 100L)
  }

  test("batch-computed rates apply to a stream (stream-static join) identically") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ref = ((0L until 300L).map(i => (i, "en")) ++
      (300L until 400L).map(i => (i, "de"))).toDF("doc_id", "stratum")
    val rates = Sampling.temperatureRates(ref, col("stratum"),
      alpha = 0.5, targetFrac = 0.5)
    val input = MemoryStream[(Long, String)]
    val sampled = Sampling.applyRates(
      input.toDF().toDF("doc_id", "stratum"), col("stratum"), rates)
    val q = sampled.writeStream.format("memory").queryName("mix_stream")
      .outputMode("append").start()
    try {
      input.addData((0L until 200L).map(i => (i, if (i < 150) "en" else "de")): _*)
      q.processAllAvailable()
      input.addData((200L until 400L).map(i => (i, if (i % 2 == 0) "en" else "de")): _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id FROM mix_stream")
        .as[Long].collect().sorted.toSeq
      // identical rows to applying the same rates in batch: the keep
      // decision is a pure function of (doc_id, stratum, rates)
      val batchDocs = ((0L until 200L).map(i => (i, if (i < 150) "en" else "de")) ++
        (200L until 400L).map(i => (i, if (i % 2 == 0) "en" else "de")))
        .toDF("doc_id", "stratum")
      val batch = Sampling.applyRates(batchDocs, col("stratum"), rates)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("temperature resample is deterministic and repartition-invariant") {
    val skew = ((0L until 300L).map((_, "en")) ++ (300L until 400L).map((_, "de")))
      .toDF("doc_id", "stratum")
    val a = Sampling.temperatureResample(skew, col("stratum"), 0.5, 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.temperatureResample(skew.repartition(7), col("stratum"), 0.5, 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a.nonEmpty && a == b)
  }

  test("top-fraction gate: ceil cut per stratum, ties broken by key") {
    val df = Seq(
      // stratum a: 3 rows, frac 0.5 → ceil(1.5)=2 kept (scores 9, 7)
      (1L, "a", 9.0), (2L, "a", 7.0), (3L, "a", 5.0),
      // stratum b: tie on score → lower doc_id wins the single slot
      (4L, "b", 4.0), (5L, "b", 4.0),
      // stratum c: single row is always kept (ceil(0.5)=1)
      (6L, "c", 0.0)
    ).toDF("doc_id", "stratum", "score")
    val kept = Sampling.topFractionByStratum(df, col("stratum"), col("score"),
      frac = 0.5).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 4L, 6L))
  }

  test("frozen thresholds replay the holistic top-fraction gate row-for-row") {
    // random scores with deliberate ties: the (score, key) lex threshold
    // must reproduce the rank gate exactly, including tie-broken cuts
    val r = new scala.util.Random(7)
    val corpus = (0L until 900L)
      .map(i => (i, s"s${i % 5}", (r.nextInt(40) / 4).toDouble))
      .toDF("doc_id", "stratum", "score")
    for (frac <- Seq(0.1, 0.3, 0.5, 0.9)) {
      val holistic = Sampling.topFractionByStratum(corpus, col("stratum"),
        col("score"), frac).select("doc_id").as[Long].collect().sorted.toSeq
      val thr = Sampling.stratumThresholds(corpus, col("stratum"),
        col("score"), frac)
      val gated = Sampling.gateAgainstThresholds(corpus, col("stratum"),
        col("score"), thr).select("doc_id").as[Long].collect().sorted.toSeq
      assert(gated == holistic, s"frac=$frac: threshold gate diverged")
    }
  }

  test("threshold gate is streaming-identical: stream-static join matches batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // thresholds frozen from a history corpus (the refresh artifact)
    val history = (0L until 400L)
      .map(i => (i, if (i % 3 == 0) "en" else "de", (i % 17).toDouble))
      .toDF("doc_id", "stratum", "score")
    val thr = Sampling.stratumThresholds(history, col("stratum"),
      col("score"), frac = 0.25)
    val batchRows = (1000L until 1400L)
      .map(i => (i, if (i % 2 == 0) "en" else "de", (i % 23).toDouble))
    val input = MemoryStream[(Long, String, Double)]
    val gatedStream = Sampling.gateAgainstThresholds(
      input.toDF().toDF("doc_id", "stratum", "score"),
      col("stratum"), col("score"), thr)
    val q = gatedStream.writeStream.format("memory").queryName("gate_stream")
      .outputMode("append").start()
    try {
      batchRows.grouped(100).foreach { c => input.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.sql("SELECT doc_id FROM gate_stream")
        .as[Long].collect().sorted.toSeq
      val batch = Sampling.gateAgainstThresholds(
        batchRows.toDF("doc_id", "stratum", "score"),
        col("stratum"), col("score"), thr)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("weighted Bernoulli sample matches an independent MD5 replay, p ∝ weight") {
    val corpus = (0L until 600L)
      .map(i => (i, if (i % 4 == 0) "en" else "de", 10L + (i * 13) % 400))
      .toDF("doc_id", "stratum", "w")
    val totals = Sampling.weightedTotals(corpus, col("stratum"), col("w"))
    val kept = Sampling.weightedBernoulliSample(corpus, col("stratum"),
      col("w"), k = 20, totals, salt = "spec")
      .select("doc_id").as[Long].collect().toSet
    // independent replay: same decision recomputed outside Spark
    def u(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:spec".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16).toDouble / 1.152921504606846976e18
    }
    val rows = (0L until 600L).map(i =>
      (i, if (i % 4 == 0) "en" else "de", 10L + (i * 13) % 400))
    val wsum = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val expect = rows.filter { case (id, s, w) =>
      u(id) < 20 * w.toDouble / wsum(s).toDouble
    }.map(_._1).toSet
    assert(kept == expect && kept.nonEmpty)
    // inclusion mass is weight-proportional: expected count ≈ k per stratum
    val bySt = rows.filter(r => kept(r._1)).groupBy(_._2).view.mapValues(_.size)
    bySt.foreach { case (s, n) => assert(n > 5 && n < 40, s"$s kept $n") }
  }

  test("weighted gate is stateless over a stream against frozen totals") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val history = (0L until 300L)
      .map(i => (i, if (i % 3 == 0) "en" else "de", 5L + i % 50))
      .toDF("doc_id", "stratum", "w")
    val totals = Sampling.weightedTotals(history, col("stratum"), col("w"))
      .cache()
    val batchRows = (1000L until 1300L)
      .map(i => (i, if (i % 2 == 0) "en" else "de", 5L + i % 50))
    val input = MemoryStream[(Long, String, Long)]
    val q = Sampling.weightedBernoulliSample(
      input.toDF().toDF("doc_id", "stratum", "w"),
      col("stratum"), col("w"), k = 30, totals)
      .writeStream.format("memory").queryName("wsamp_stream")
      .outputMode("append").start()
    try {
      batchRows.grouped(100).foreach { c => input.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.sql("SELECT doc_id FROM wsamp_stream")
        .as[Long].collect().sorted.toSeq
      val batch = Sampling.weightedBernoulliSample(
        batchRows.toDF("doc_id", "stratum", "w"),
        col("stratum"), col("w"), k = 30, totals)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("quality-budget admission equals the stateless lex-gate at the boundary") {
    // the q91 manifest's budget cut (cum_tokens <= B over quality-desc
    // order) is equivalent to a per-row (quality, id) threshold gate:
    // cum_tokens is monotone in the manifest order, so the admitted set
    // is a prefix, and a prefix of a total order IS a lex threshold —
    // which is what makes budget ADMISSION streaming-expressible against
    // a frozen epoch boundary even though the manifest positions
    // themselves are holistic (epoch-recomputed)
    val r = new scala.util.Random(11)
    val feats = (0L until 500L)
      .map(i => (i, (r.nextInt(12)).toDouble, 10L + r.nextInt(90)))
      .toDF("doc_id", "quality", "n_tokens")
    val manifest = graft.operators.PrefixSum.withGlobalCumSum(feats,
      Seq(col("quality").desc, col("doc_id").asc), col("n_tokens"),
      cumCol = "cum_tokens", rankCol = Some("rank"))
    val budget = 8000L
    val admitted = manifest.filter(col("cum_tokens") <= budget)
    val byBudget = admitted.select("doc_id").as[Long].collect().sorted.toSeq
    assert(byBudget.nonEmpty && byBudget.size < 500)
    // boundary = last admitted row in manifest order
    val (bq, bid) = admitted.orderBy(col("rank").desc).limit(1)
      .select("quality", "doc_id").as[(Double, Long)].head()
    val byGate = feats.filter(col("quality") > bq ||
        (col("quality") === bq && col("doc_id") <= bid))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(byGate == byBudget)
  }
}

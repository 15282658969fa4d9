package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpecBase {
  import spark.implicits._

  test("token count handles empty strings and repeated spaces") {
    val df = Seq("a b  c", "", "   ", "one").toDF("text")
    val counts = df.select(TextAnalysis.tokenCount(col("text"))).as[Int].collect().toSeq
    assert(counts == Seq(3, 0, 0, 1))
  }

  test("fingerprint is case/trim-insensitive but content-sensitive") {
    val df = Seq(("a", "Hello World"), ("b", "  hello world  "), ("c", "hello worlds"))
      .toDF("id", "text")
    val fps = df.select(col("id"), TextAnalysis.fingerprint(col("text")))
      .as[(String, String)].collect().toMap
    assert(fps("a") == fps("b"))
    assert(fps("a") != fps("c"))
  }

  test("rolling hash is order-sensitive, unlike a bag-of-words") {
    val df = Seq("alpha beta gamma", "gamma beta alpha").toDF("text")
    val hashes = df.select(TextAnalysis.rollingHash(col("text"))).as[Long].collect()
    assert(hashes(0) != hashes(1))
    assert(hashes.forall(h => h >= 0 && h < 2147483647L))
  }

  test("bigram LM perplexity matches the hand-computed add-k model") {
    // train: bigrams (a,b)×3, (b,a)×1 → histories a:3, b:1; vocab V=2, k=0.5
    val train = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val lm = TextAnalysis.trainBigramLm(train)
    val docs = Seq(
      (10L, "a b"),   // seen bigram: ln(3.5/4)          → ppl 4/3.5
      (11L, "a a"),   // seen history, unseen cont: ln(0.5/4) → ppl 8
      (12L, "c b"),   // unseen history: -ln(2)          → ppl 2
      (13L, "x y z"), // two unseen-history bigrams      → ppl 2
      (14L, "a")      // <2 tokens → dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.perplexityScores(docs, lm)
      .select("doc_id", "n_bigrams", "ppl").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(10L, 11L, 12L, 13L))
    assert(out(10L)._1 == 1L && math.abs(out(10L)._2 - 4.0 / 3.5) < 1e-9)
    assert(math.abs(out(11L)._2 - 8.0) < 1e-9)
    assert(math.abs(out(12L)._2 - 2.0) < 1e-9)
    assert(out(13L)._1 == 2L && math.abs(out(13L)._2 - 2.0) < 1e-9)
  }

  test("naive bayes recovers class-separating vocabulary on held-out docs") {
    val train = Seq(
      ("cat", "meow purr meow whiskers"), ("cat", "purr meow nap"),
      ("dog", "woof bark woof fetch"), ("dog", "bark woof tail")
    ).toDF("cls", "text")
    val model = TextAnalysis.trainNaiveBayes(train, "cls")
    val test = Seq((1L, "meow purr"), (2L, "woof bark bark"),
      (3L, "fetch tail woof")).toDF("doc_id", "text")
    val pred = TextAnalysis.naiveBayesClassify(test, model)
      .as[(Long, String)].collect().toMap
    assert(pred == Map(1L -> "cat", 2L -> "dog", 3L -> "dog"))
  }

  test("margin audit bins by best-vs-second log-margin and reports per-bin accuracy") {
    val train = Seq(
      ("cat", "meow purr meow whiskers"), ("cat", "purr meow nap"),
      ("dog", "woof bark woof fetch"), ("dog", "bark woof tail")
    ).toDF("cls", "text")
    val model = TextAnalysis.trainNaiveBayes(train, "cls")
    // strongly-separated docs (pure class vocab) vs an all-OOV doc whose
    // class scores tie (margin 0 → bin 0); truths chosen so bin 0 is a
    // guaranteed miss (tie-break predicts "cat", truth says "dog")
    val eval = Seq(
      (1L, "meow purr meow purr meow purr", "cat"),
      (2L, "woof bark woof bark woof bark", "dog"),
      (3L, "zz qq", "dog")
    ).toDF("doc_id", "text", "cls")
    val audit = TextAnalysis.naiveBayesMarginAudit(eval, model, "cls")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(audit.values.map(_._1).sum == 3L, "every eval doc lands in a bin")
    // the tied OOV doc: margin exactly 0 → bin 0, predicted wrong
    assert(audit(0L)._1 >= 1L && audit(0L)._2 == 0L && audit(0L)._3 == 0.0)
    // the separated docs carry positive margin and are all correct
    val upper = audit.filter(_._1 > 0L).values
    assert(upper.map(_._1).sum == 2L && upper.forall(v => v._1 == v._2))
    assert(upper.forall(_._3 == 1.0))
    // binning consistency: n_correct never exceeds n_docs
    assert(audit.values.forall(v => v._2 <= v._1))
  }

  test("margin audit: single-class model lands every doc in the top bin, no overflow") {
    val model = TextAnalysis.trainNaiveBayes(
      Seq(("only", "alpha beta gamma")).toDF("cls", "text"), "cls")
    val audit = TextAnalysis.naiveBayesMarginAudit(
      Seq((1L, "alpha beta", "only"), (2L, "zz", "other"))
        .toDF("doc_id", "text", "cls"), model, "cls")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
    // no runner-up class → capped margin → bin 9 (and no ANSI overflow
    // from flooring an unbounded sentinel); doc 1 correct, doc 2 not
    assert(audit.toSeq == Seq(9L -> ((2L, 1L))))
  }

  test("naive bayes tie-break is deterministic: all-unseen doc with equal stats") {
    // symmetric classes (same doc count, same token totals): an all-OOV
    // doc scores identically for both → tie-break by class ascending
    val train = Seq(("a", "x x"), ("b", "y y")).toDF("cls", "text")
    val model = TextAnalysis.trainNaiveBayes(train, "cls")
    val pred = TextAnalysis.naiveBayesClassify(
      Seq((1L, "zz qq")).toDF("doc_id", "text"), model)
      .as[(Long, String)].collect().toMap
    assert(pred == Map(1L -> "a"))
  }

  test("LM perplexity and NB classify run unchanged on a stream (parity)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val train = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c d c d"))
      .toDF("doc_id", "text")
    val lm = TextAnalysis.trainBigramLm(train)
    val nb = TextAnalysis.trainNaiveBayes(
      Seq(("x", "a b a b"), ("y", "c d c d")).toDF("cls", "text"), "cls")
    val docs = Seq((10L, "a b a"), (11L, "c d"), (12L, "a d q"))
    implicit val sqlCtx = spark.sqlContext
    // the classifier chains two aggregations (per-class sum, then
    // argmax); Spark's multi-stateful-operator check is a heuristic for
    // watermarked append/update pipelines — in COMPLETE mode the state
    // is recomputed whole every trigger, so no row can be late-dropped
    val checkKey = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prevCheck = spark.conf.get(checkKey)
    spark.conf.set(checkKey, "false")
    val ms = MemoryStream[(Long, String)]
    ms.addData(docs: _*)
    val sdf = ms.toDF.toDF("doc_id", "text")
    val q1 = TextAnalysis.perplexityScores(sdf, lm)
      .writeStream.format("memory").queryName("ppl_stream")
      .outputMode("complete").start()
    val q2 = TextAnalysis.naiveBayesClassify(sdf, nb)
      .writeStream.format("memory").queryName("nb_stream")
      .outputMode("complete").start()
    try {
      q1.processAllAvailable(); q2.processAllAvailable()
      val bdf = docs.toDF("doc_id", "text")
      val pplBatch = TextAnalysis.perplexityScores(bdf, lm)
        .select("doc_id", "n_bigrams", "ppl")
        .as[(Long, Long, Double)].collect().toSet
      val pplStream = spark.sql("SELECT doc_id, n_bigrams, ppl FROM ppl_stream")
        .as[(Long, Long, Double)].collect().toSet
      assert(pplStream == pplBatch && pplStream.nonEmpty)
      val nbBatch = TextAnalysis.naiveBayesClassify(bdf, nb)
        .as[(Long, String)].collect().toSet
      val nbStream = spark.sql("SELECT doc_id, pred FROM nb_stream")
        .as[(Long, String)].collect().toSet
      assert(nbStream == nbBatch && nbStream.nonEmpty)
    } finally { q1.stop(); q2.stop(); spark.conf.set(checkKey, prevCheck) }
  }

  test("quality score stays in [0,1]; natural text beats punctuation soup") {
    val df = Seq(
      ("nat", "the quick brown fox is on the hill and it runs to the river for a drink today"),
      ("junk", "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
      ("empty", "")).toDF("id", "text")
    val q = df.select(col("id"), TextAnalysis.qualityScore(col("text")))
      .as[(String, Double)].collect().toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q("nat") > q("junk"))
  }

  test("langId votes by marker tokens with deterministic tie-break") {
    val df = Seq(
      ("en", "the cat and the dog of the house"),
      ("de", "der hund und die katze ist das tier"),
      ("fr", "le chien et la maison les arbres"),
      ("und", "zzz qqq www")).toDF("expected", "text")
    val out = df.select(col("expected"), TextAnalysis.langId(col("text")))
      .as[(String, String)].collect()
    out.foreach { case (exp, got) => assert(got == exp, s"expected $exp got $got") }
  }

  test("tf-idf top terms: rational scores, rank order, term tie-break") {
    val docs = Seq(
      (0L, "apple apple banana"),
      (1L, "apple cherry"),
      (2L, "banana banana cherry cherry date")).toDF("doc_id", "text")
    // N=3; df: apple 2, banana 2, cherry 2, date 1; score = tf*4/(df+1)
    val out = TextAnalysis.tfIdfTopTerms(docs, k = 2)
      .select("doc_id", "term", "score").as[(Long, String, Double)]
      .collect().groupBy(_._1).map { case (d, rs) =>
        (d, rs.map(r => (r._2, r._3)).toSeq.sortBy(t => (-t._2, t._1))) }
    assert(out(0L) == Seq(("apple", 2.666667), ("banana", 1.333333)))
    assert(out(1L).map(_._1).toSet == Set("apple", "cherry")) // equal scores 1.333333
    // doc 2: banana and cherry tie at 2.666667 -> term-asc wins; date (2.0) cut by k=2
    assert(out(2L) == Seq(("banana", 2.666667), ("cherry", 2.666667)))
  }

  test("repetition signals: fractions, distinct ratio, and thresholds") {
    val df = Seq(
      (1L, "spam spam spam spam"),          // top word 4/4, top bigram 3/3
      (2L, "a b c d"),                      // all distinct: top word 1/4, bigram 1/3
      (3L, "x y x y x y"),                  // top word 3/6; bigram "x y" 3/5
      (4L, "solo")                          // one token, no bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(df,
        topWordMax = 0.5, topBigramMax = 0.5)
      .as[(Long, Long, Long, Double, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 4L, 1L, 1.0, 1.0, 0.25, true)))
    assert(out(2L) == ((2L, 4L, 4L, 0.25, 0.333333, 1.0, false)))
    assert(out(3L) == ((3L, 6L, 2L, 0.5, 0.6, 0.333333, true)))
    // single-token doc: no bigrams -> bigram fraction 0, not repetitive
    assert(out(4L) == ((4L, 1L, 1L, 1.0, 0.0, 1.0, true)))
  }

  test("vocab coverage: ranks by frequency, cumulative share reaches 1") {
    val df = Seq(
      (1L, "b b b a a c"),
      (2L, "a b d")
    ).toDF("doc_id", "text")
    // counts: a=3, b=4, c=1, d=1 (total 9); rank by cnt desc, term asc
    val out = TextAnalysis.vocabCoverage(df)
      .select("term", "cnt", "rank", "coverage")
      .as[(String, Long, Long, Double)].collect().sortBy(_._3).toSeq
    assert(out == Seq(
      ("b", 4L, 1L, 0.444444),
      ("a", 3L, 2L, 0.777778),
      ("c", 1L, 3L, 0.888889),
      ("d", 1L, 4L, 1.0)))
  }

  test("documentFeatures is stateless, so it streams: per-batch equals batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val feats = TextAnalysis.documentFeatures(
      input.toDF().toDF("doc_id", "text"))
    val q = feats.writeStream.format("memory").queryName("feat_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, "the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
      input.addData((2L, "der die und das ist hier"))
      q.processAllAvailable()
      val streamed = spark.sql(
          "SELECT doc_id, n_tokens, quality, lang_pred FROM feat_stream")
        .as[(Long, Long, Double, String)].collect().toSet
      val batch = TextAnalysis.documentFeatures(
          Seq((1L, "the quick brown fox jumps over the lazy dog"),
            (2L, "der die und das ist hier")).toDF("doc_id", "text"))
        .select("doc_id", "n_tokens", "quality", "lang_pred")
        .as[(Long, Long, Double, String)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
      // and the features are sane: doc 1 is english, doc 2 german
      assert(batch.find(_._1 == 1L).get._4 == "en")
      assert(batch.find(_._1 == 2L).get._4 == "de")
    } finally q.stop()
  }

  test("rare-token ratio: df threshold separates common from rare terms") {
    // "shared" appears in all 3 docs (df=3, not rare at threshold 3);
    // each docN also has a unique token (df=1, rare)
    val df = Seq(
      (1L, "shared one1"),
      (2L, "shared two2"),
      (3L, "shared three3 three3")).toDF("doc_id", "text")
    val out = TextAnalysis.rareTokenRatio(df, dfThreshold = 3)
      .select("doc_id", "n_tokens", "n_rare", "rare_ratio")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 2L, 1L, 0.5)))
    // doc 3: 3 tokens, "three3" twice (df=1 -> both occurrences rare)
    assert(out(3L) == ((3L, 3L, 2L, 0.666667)))
  }

  test("repetition signals: zero-token docs produce no row") {
    val df = Seq((1L, "a b"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val ids = TextAnalysis.repetitionSignals(df)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("PII scrub: counts and ordered redaction of emails, IPs, phones") {
    val df = Seq(
      (1L, "mail a.b-c+x@sub.example.org or admin@test.io from 192.168.1.254 call 555-0123"),
      (2L, "no pii here just text"),
      (3L, "dotted host 10.0.0.1 twice 10.0.0.2 and 555-9999")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scrubPii(df)
      .select("doc_id", "n_emails", "n_ips", "n_phones", "scrubbed")
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 2 && out(1L)._3 == 1 && out(1L)._4 == 1)
    assert(out(1L)._5 == "mail [EMAIL] or [EMAIL] from [IP] call [PHONE]")
    assert(out(2L) == ((2L, 0L, 0L, 0L, "no pii here just text")))
    assert(out(3L)._5 == "dotted host [IP] twice [IP] and [PHONE]")
    // email scrub runs first: a host-like dotted string inside an email is
    // consumed whole, never half-matched as an IP
    val tricky = Seq((9L, "x 10.0.0.1@h.example.com y")).toDF("doc_id", "text")
    val s = TextAnalysis.scrubPii(tricky).select("scrubbed").as[String].head()
    assert(s == "x [EMAIL] y")
  }

  test("boilerplate scrub: frequent segments stripped, order preserved") {
    // "nav bar" opens 3 of 4 docs (df=3 > 50% of 4) → boilerplate;
    // everything else is unique (df=1) → kept in original order.
    val df = Seq(
      (1L, "nav bar alpha beta gamma delta"),
      (2L, "nav bar epsilon zeta"),
      (3L, "nav bar eta theta"),
      (4L, "iota kappa")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scrubBoilerplate(df, segTokens = 2, maxDfFrac = 0.5)
      .select("doc_id", "clean_text", "n_kept")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == "alpha beta gamma delta" && out(1L)._3 == 2)
    assert(out(2L)._2 == "epsilon zeta")
    assert(out(3L)._2 == "eta theta")
    assert(out(4L)._2 == "iota kappa")
  }

  test("incremental scrub: batch against history df; unseen segments kept") {
    val history = Seq(
      (1L, "footer text alpha beta"),
      (2L, "footer text gamma delta"),
      (3L, "footer text epsilon zeta")
    ).toDF("doc_id", "text")
    val segDf = TextAnalysis.segmentDf(history, segTokens = 2)
    val n = history.agg(count(lit(1)).as("n_docs"))
    // "footer text" has df=3 > 0.5*3 → boilerplate; "brand new" is absent
    // from history (df=0) → kept
    val batch = Seq((10L, "footer text brand new")).toDF("doc_id", "text")
    val out = TextAnalysis.scrubBoilerplateAgainst(batch, segDf, n,
      segTokens = 2, maxDfFrac = 0.5)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(out(10L) == "brand new")
    // self-application equals the one-shot scrub by construction
    val selfA = TextAnalysis.scrubBoilerplate(history, 2, 0.5)
      .collect().map(_.toSeq).toSet
    val selfB = TextAnalysis.scrubBoilerplateAgainst(history, segDf, n, 2, 0.5)
      .collect().map(_.toSeq).toSet
    assert(selfA == selfB)
  }

  test("streaming scrub: batches scrub against the static segment-df per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val history = Seq(
      (1L, "footer text alpha beta"),
      (2L, "footer text gamma delta"),
      (3L, "footer text epsilon zeta")
    ).toDF("doc_id", "text")
    // the materialized corpus-snapshot artifacts a refresh job reads
    val segDf = TextAnalysis.segmentDf(history, segTokens = 2).cache()
    val n = history.agg(count(lit(1)).as("n_docs")).cache()
    val input = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.Map[Long, String]()
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        TextAnalysis.scrubBoilerplateAgainst(batch, segDf, n,
            segTokens = 2, maxDfFrac = 0.5)
          .select("doc_id", "clean_text").as[(Long, String)].collect()
          .foreach { case (id, t) => out.synchronized { out(id) = t } }
        ()
      }.start()
    try {
      input.addData((10L, "footer text brand new"))
      q.processAllAvailable()
      input.addData((11L, "footer text"), (12L, "alpha beta own words"))
      q.processAllAvailable()
      // 10/12 keep their non-boilerplate segments; 11 is pure boilerplate
      // (no row); "alpha beta" has history df=1 <= cap so it survives
      assert(out.synchronized(out.toMap) ==
        Map(10L -> "brand new", 12L -> "alpha beta own words"))
    } finally q.stop()
  }

  test("boilerplate scrub: all-boilerplate docs drop; odd tails segment whole") {
    val df = Seq(
      (1L, "footer text"),
      (2L, "footer text"),
      (3L, "footer text"),
      (4L, "unique one two") // odd token count: tail segment is 1 token
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scrubBoilerplate(df, segTokens = 2, maxDfFrac = 0.5)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    // docs 1-3 are pure boilerplate (df=3 > 2.0 cap) → no row survives
    assert(out.keySet == Set(4L))
    assert(out(4L) == "unique one two")
  }

  test("repeated-ngram scrub cuts later occurrences and keeps the first") {
    val rep = "a b c d e" // the repeated 5-gram
    val df = Seq(
      (1L, s"$rep x y z w v $rep"),          // exact repeat at the tail
      (2L, "p q r s t u"),                    // no repeats → untouched
      (3L, "one two three"),                  // < 5 words → untouched
      (4L, s"$rep $rep $rep")                 // back-to-back repeats
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scrubRepeatedNgrams(df, n = 5)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(out(1L) == (s"$rep x y z w v", 5L))
    assert(out(2L) == ("p q r s t u", 0L))
    assert(out(3L) == ("one two three", 0L))
    // doc 4: starts 6 and 11 repeat gram(1); overlapping interior grams
    // (e.g. "b c d e a") also first-occur at start 2 and repeat at 7 —
    // every index from 6..15 is covered, so only the first copy survives
    assert(out(4L) == (rep, 10L))
  }

  test("repeated-ngram scrub streams via foreachBatch: per-batch equals batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rep = "a b c d e"
    val docs = Seq((1L, s"$rep x $rep"), (2L, "p q r s t u"),
      (3L, s"$rep $rep"))
    val expected = TextAnalysis.scrubRepeatedNgrams(
      docs.toDF("doc_id", "text"), n = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // the cut decision reads only the row's own document (the window key
    // includes doc_id), so applying the scrub per micro-batch — the
    // standard foreachBatch deployment — IS the batch semantics as long
    // as each document arrives whole
    val out = scala.collection.mutable.Set.empty[(Long, String, Long)]
    val ms = MemoryStream[(Long, String)]
    ms.addData(docs: _*)
    val q = ms.toDF.toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        TextAnalysis.scrubRepeatedNgrams(batch, n = 5).collect()
          .foreach(r => out.synchronized {
            out += ((r.getLong(0), r.getString(1), r.getLong(2))) })
      }
      .start()
    try {
      q.processAllAvailable()
      assert(out.synchronized(out.toSet) == expected && expected.size == 3)
    } finally q.stop()
  }

  test("repeated-ngram scrub covers overlapping repeat windows exactly once") {
    // "a a a a a a a": gram "a a a a a" occurs at starts 1,2,3; starts
    // 2,3 are repeats covering indexes 2..7 → keep index 1 only
    val df = Seq((1L, "a a a a a a a")).toDF("doc_id", "text")
    val out = TextAnalysis.scrubRepeatedNgrams(df, n = 5)
      .collect().map(r => (r.getString(1), r.getLong(2))).head
    assert(out == ("a", 6L))
  }
}

package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class NativeExpressionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("dotF matches the plain-Scala dot product and survives codegen") {
    val df = Seq((Seq(1.5f, -2f, 3f), Seq(2f, 0.5f, 4f))).toDF("a", "b")
    val d = df.select(native.dotF(col("a"), col("b"))).as[Double].head()
    assert(math.abs(d - (1.5 * 2 + -2 * 0.5 + 3 * 4)) < 1e-12)
  }

  test("minHashSig: identical inputs identical sigs; length k; empty input sentinel") {
    val df = Seq(
      (0L, Seq("a", "b", "c")),
      (1L, Seq("a", "b", "c")),
      (2L, Seq.empty[String])).toDF("id", "sh")
    val sigs = df.select(col("id"), native.minHashSig(col("sh"), 8))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L).length == 8)
    assert(sigs(2L).forall(_ == Long.MaxValue))
  }

  test("hyperplaneSignBits matches the explicit md5-parity projection") {
    val vecs = Seq(
      (0L, Seq.tabulate(8)(i => (i - 3.5).toFloat)),
      (1L, Seq.tabulate(8)(i => math.sin(i.toDouble).toFloat)),
      (2L, Seq.fill(8)(0f)))
    val got = vecs.toDF("id", "v")
      .select(col("id"), native.hyperplaneSignBits(col("v"), 16).as("bits"))
      .as[(Long, Long)].collect().toMap
    def expected(v: Seq[Float]): Long = {
      var bits = 0L
      for (p <- 0 until 16) {
        var s = 0.0
        for (k <- v.indices) {
          val sign = if ((Md5Utils.hash60(s"$p,$k") & 1L) == 1L) 1.0 else -1.0
          s += sign * v(k).toDouble
        }
        if (s >= 0) bits |= (1L << p)
      }
      bits
    }
    vecs.foreach { case (id, v) => assert(got(id) == expected(v), s"vec $id") }
    // zero vector projects to 0 on every plane → all sign bits set (s >= 0)
    assert(got(2L) == (1L << 16) - 1)
  }

  test("SQL registration: native functions callable from spark.sql") {
    native.registerAll(spark)
    val row = spark.sql(
      """SELECT simhash64(array('spark', 'engine')) AS sh,
                dot_product_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
                              array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dp,
                size(word_shingles('a b c d', 3)) AS nsh,
                size(minhash_sig(array('x'), 4)) AS k,
                size(whitespace_tokens('a  b c')) AS nt,
                array_count_in(whitespace_tokens('the cat and the dog'),
                               array('the', 'and')) AS cnt
      """).collect().head
    assert(row.getDouble(1) == 11.0)
    assert(row.getInt(2) == 2) // "a b c", "b c d"
    assert(row.getInt(3) == 4)
    assert(row.getInt(4) == 3) // double space collapses
    assert(row.getInt(5) == 3) // the, and, the
    // simhash deterministic across invocations
    val again = spark.sql("SELECT simhash64(array('spark', 'engine'))").collect().head.getLong(0)
    assert(row.getLong(0) == again)
    // round-4 additions are on the SQL surface too
    val r4 = spark.sql(
      """SELECT size(adjacent_bigrams(whitespace_tokens('x y x y'))) AS nb,
                token_freq_stats(whitespace_tokens('x y x y x')).top_freq AS tf
      """).collect().head
    assert(r4.getInt(0) == 3)  // "x y", "y x", "x y"
    assert(r4.getLong(1) == 3L)
  }

  test("hash family: generated-code path agrees with interpreted eval") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, FloatType, StringType}
    import org.apache.spark.unsafe.types.UTF8String

    val tokens = Seq("alpha", "beta", "gamma", "delta", "beta")
    val text = "the quick brown fox jumps over the lazy dog"
    val vec = Seq.tabulate(16)(i => math.sin(i.toDouble).toFloat)

    // interpreted path: eval() on an InternalRow
    val sArr = new GenericArrayData(tokens.map(UTF8String.fromString).toArray[Any])
    val sRef = BoundReference(0, ArrayType(StringType), nullable = false)
    val sRow = InternalRow(sArr)
    val fArr = new GenericArrayData(vec.toArray[Any])
    val fRef = BoundReference(0, ArrayType(FloatType), nullable = false)
    val fRow = InternalRow(fArr)
    val tRef = BoundReference(0, StringType, nullable = false)
    val tRow = InternalRow(UTF8String.fromString(text))

    val iSigP = MinHashSigP(sRef, 16).eval(sRow).asInstanceOf[ArrayData].toLongArray.toSeq
    val iSig = MinHashSig(sRef, 16).eval(sRow).asInstanceOf[ArrayData].toLongArray.toSeq
    val iSh64 = SimHash64(sRef).eval(sRow).asInstanceOf[Long]
    val iSh60 = SimHash60P(sRef).eval(sRow).asInstanceOf[Long]
    val iBits = HyperplaneSignBits(fRef, 32).eval(fRow).asInstanceOf[Long]
    val iShin = WordShingles(tRef, 3).eval(tRow).asInstanceOf[ArrayData]
      .toArray[UTF8String](StringType).map(_.toString).toSeq

    // codegen path: project over a shuffled (non-local) relation so the
    // ConvertToLocalRelation rule can't constant-fold it interpreted
    val df = Seq((tokens, text, vec)).toDF("toks", "text", "vec").repartition(1)
    val (gSigP, gSig, gSh64, gSh60, gBits, gShin) = df.select(
      native.minHashSigP(col("toks"), 16),
      native.minHashSig(col("toks"), 16),
      native.simHash64(col("toks")),
      native.simHash60P(col("toks")),
      native.hyperplaneSignBits(col("vec"), 32),
      native.wordShingles(col("text"), 3))
      .as[(Seq[Long], Seq[Long], Long, Long, Long, Seq[String])].head()

    assert(gSigP == iSigP && gSig == iSig && gSh64 == iSh64 &&
      gSh60 == iSh60 && gBits == iBits && gShin == iShin)
  }

  test("whitespaceTokens and arrayCountIn match their HOF formulations") {
    val df = Seq(
      "the quick  brown fox", "  ", "", "single",
      "the the the and of", "a\tb c").toDF("text")
    val rows = df.select(
      native.whitespaceTokens(col("text")),
      filter(split(col("text"), " "), t => t =!= lit("")),
      native.arrayCountIn(native.whitespaceTokens(col("text")), Seq("the", "and")),
      size(filter(filter(split(col("text"), " "), t => t =!= lit("")),
        t => array_contains(array(lit("the"), lit("and")), t))))
      .as[(Seq[String], Seq[String], Int, Int)].collect()
    rows.foreach { case (nt, ht, nc, hc) =>
      assert(nt == ht, s"tokens mismatch: $nt vs $ht")
      assert(nc == hc, s"count mismatch: $nc vs $hc")
    }
  }

  test("adjacentBigrams matches the zip_with HOF formulation, keeps duplicates") {
    val df = Seq("x y x y x", "a b", "solo", "").toDF("text")
    val toks = native.whitespaceTokens(col("text"))
    val rows = df.select(
      native.adjacentBigrams(toks),
      zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (nb, hb) => assert(nb == hb, s"$nb vs $hb") }
    // duplicates preserved (WordShingles would dedup)
    assert(rows(0)._1 == Seq("x y", "y x", "x y", "y x"))
  }

  test("tokenFreqStats matches the explode/groupBy formulation") {
    val df = Seq("x y x y x", "a b c", "solo", "q q q q").toDF("text")
    val toks = native.whitespaceTokens(col("text"))
    val rows = df.select(native.tokenFreqStats(toks).as("s"))
      .select("s.n_total", "s.n_distinct", "s.top_freq")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows == Seq((5L, 2L, 3L), (3L, 3L, 1L), (1L, 1L, 1L), (4L, 1L, 4L)))
    // empty array: all zeros
    val empty = Seq("").toDF("text")
      .select(native.tokenFreqStats(native.whitespaceTokens(col("text"))).as("s"))
      .select("s.n_total", "s.n_distinct", "s.top_freq")
      .as[(Long, Long, Long)].head()
    assert(empty == ((0L, 0L, 0L)))
  }

  test("GraftExtensions exposes the same builders") {
    // unit-level: the extension registers every sqlFunctions entry
    assert(native.sqlFunctions.map(_._1).sorted ==
      Seq("adjacent_bigrams", "array_count_in", "char_gram_hashes",
        "char_gram_pos_hashes", "char_gram_winnow",
        "dot_product_d", "dot_product_f", "hilbert_key2",
        "hyperplane_sign_bits",
        "minhash_sig", "minhash_sig_p", "ngram_buckets", "quantize_int8",
        "random_project_f", "simhash60_p", "simhash64",
        "token_freq_stats", "whitespace_tokens", "word_shingles"))
  }

  test("ngramBuckets matches the column-chain formulation exactly") {
    // reference: split(lower(text), ' ') minus empties; unigrams then
    // '_'-joined bigrams; md5-60 % buckets — the replaced column chain
    // and the DuckDB oracle formula
    val texts = Seq(
      "Spark Makes  Plans",        // double space → empty token dropped
      "one",                        // single token: no bigrams
      "",                           // empty: no features
      "  ",                         // only spaces: no features
      "a b a b a",                  // repeated features keep duplicates
      "Émile zoé ça Émile zoé")     // non-ASCII lowercase path
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString
        .take(15), 16)
    }
    def ref(text: String, b: Int): Seq[Long] = {
      val toks = text.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
      val feats = toks ++ toks.sliding(2).filter(_.size == 2)
        .map(_.mkString("_"))
      feats.map(f => h60(f) % b)
    }
    val got = texts.toDF("text")
      .select(native.ngramBuckets(col("text"), 64).as("b"))
      .as[Seq[Long]].collect().toSeq
    assert(got == texts.map(ref(_, 64)))
  }

  test("charGramWinnow matches a brute-force rightmost-min replay") {
    // brute reference: rightmost argmin per window of w consecutive
    // k-gram hashes, consecutive repeats collapsed; short docs winnow
    // the single window of all their hashes
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString
        .take(15), 16)
    }
    def brute(text: String, k: Int, w: Int): Seq[(Int, Long)] = {
      val cps = {
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < text.length) {
          val n = Character.charCount(text.codePointAt(i))
          b += text.substring(i, i + n); i += n
        }
        b.toSeq
      }
      val n = cps.length - k + 1
      if (n <= 0) return Seq.empty
      val hs = (0 until n).map(i => h60(cps.slice(i, i + k).mkString))
      val we = math.min(w, n)
      var last = -1
      (0 to n - we).flatMap { t =>
        val m = (t until t + we).map(hs).min
        val p = (t until t + we).filter(i => hs(i) == m).max
        if (p != last) { last = p; Some((p + 1, hs(p))) } else None
      }
    }
    val rnd = new scala.util.Random(11)
    val periodic = "ab" * 40                       // equal hashes → tie path
    val astral = "🦀🦀" + ("ab" * 10) + "🦀" + ("cd" * 10)
    val texts = Seq(periodic, astral, "tiny", "",
      ("x" * 7) + "SHARED-RUN-SHARED-RUN-SHARED" + ("y" * 5)) ++
      Seq.fill(10)(rnd.alphanumeric.take(3 + rnd.nextInt(90)).mkString)
    for (k <- Seq(5, 10); w <- Seq(1, 4, 8)) {
      val got = texts.toDF("text")
        .select(native.charGramWinnow(col("text"), k, w).as("g"))
        .as[Seq[(Int, Long)]].collect().toSeq
      val want = texts.map(brute(_, k, w))
      assert(got == want, s"k=$k w=$w")
    }
  }

  test("randomProjectF matches the composed per-plane literal dot products") {
    val vecs = Seq(
      (0L, Seq.tabulate(12)(i => math.sin(i.toDouble).toFloat)),
      (1L, Seq.fill(12)(0f)),
      (2L, Seq.tabulate(12)(i => (i - 5.5).toFloat)))
    val df = vecs.toDF("id", "v").repartition(1)
    val signs = graft.ext.Similarity.rprojSigns(12, 5, seed = "parity")
    val composed = df.select(col("id"),
      graft.ext.Similarity.randomProject(col("v"), signs).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    val nativeP = df.select(col("id"),
      native.randomProjectF(col("v"), 12, 5, "parity").as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    vecs.foreach { case (id, _) =>
      assert(nativeP(id) == composed(id), s"vec $id")
      assert(nativeP(id).length == 5)
    }
  }

  test("dotD matches the plain-Scala double dot product, incl. via SQL") {
    val df = Seq((Seq(1.5, -2.0, 3.25), Seq(2.0, 0.5, 4.0))).toDF("a", "b")
    val d = df.select(native.dotD(col("a"), col("b"))).as[Double].head()
    assert(d == (1.5 * 2.0 + -2.0 * 0.5 + 3.25 * 4.0))
    native.registerAll(spark)
    val viaSql = spark.sql(
      """SELECT dot_product_d(array(1.5D, -2.0D, 3.25D),
                              array(2.0D, 0.5D, 4.0D)) AS d,
                size(random_project_f(array(CAST(1.0 AS FLOAT)), 1, 3, 'rp')) AS n
      """).collect().head
    assert(viaSql.getDouble(0) == d)
    assert(viaSql.getInt(1) == 3)
  }

  test("nearestCentroidsF: NaN vectors get deterministic ascending probes, no crash") {
    val cents = (0 until 20).flatMap(i => Seq(i.toFloat, 1f, 0f, 0f))
    val df = Seq(
      (1L, Seq(Float.NaN, 1f, 0f, 0f)),  // NaN sim against every centroid
      (2L, Seq(0f, 1f, 0f, 0f))          // normal row in the same batch
    ).toDF("id", "v")
    val got = df.select(col("id"),
        native.nearestCentroidsF(col("v"), cents, 20, 3, tiesLarger = false)
          .as("p"))
      .as[(Long, Seq[Int])].collect().toMap
    // all-NaN comparisons are false everywhere: slots fall back to the
    // first untaken centroid, yielding ascending cids deterministically
    assert(got(1L) == Seq(0, 1, 2))
    // the normal row is unaffected (centroid 0 = (0,1,0,0) is exact)
    assert(got(2L).head == 0)
  }

  test("charGramHashes windows count CODE POINTS on supplementary-plane text") {
    // brute reference over code-point windows, mod-p selection,
    // first-occurrence distinct — exactly the kernel contract
    def h60(bytes: Array[Byte]): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString
        .take(15), 16)
    }
    def brute(text: String, k: Int, modP: Int): Seq[Long] = {
      val cps = {
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < text.length) {
          val n = Character.charCount(text.codePointAt(i))
          b += text.substring(i, i + n); i += n
        }
        b.toSeq
      }
      val seen = scala.collection.mutable.LinkedHashSet.empty[Long]
      for (w <- cps.sliding(k) if w.size == k) {
        val h = h60(w.mkString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if (h % modP == 0) seen += h
      }
      seen.toSeq
    }
    // crab emoji = U+1F980 (2 UTF-16 units, 4 UTF-8 bytes): a UTF-16
    // window walk would split surrogates and hash different byte runs
    val texts = Seq(
      "🦀abc🦀abc🦀",          // astral mixed with ASCII
      "ab🦀🦀🦀cd" * 3,         // astral runs + repetition (distinct path)
      "plain ascii only here",  // ASCII fast path
      "éèêë çà ü öäñ",          // 2-byte BMP path
      "🦀🦀",                   // shorter than the window → empty
      "")
    for (k <- Seq(3, 5); modP <- Seq(1, 2)) {
      val got = texts.toDF("text")
        .select(native.charGramHashes(col("text"), k, modP).as("g"))
        .as[Seq[Long]].collect().toSeq
      assert(got == texts.map(brute(_, k, modP)), s"k=$k modP=$modP")
    }
  }

  test("sorted_bucket_of: greatest-boundary search, edges, null, NaN") {
    import spark.implicits._
    val bounds = Seq(1.0, 5.0, 5.5, 100.0)
    val buckets = Seq(0L, 2L, 3L, 7L) // sparse bucket ids (empty buckets)
    val vals = Seq[java.lang.Double](
      0.5,            // below every boundary → first bucket
      1.0, 4.999,     // exactly-on and interior of bucket 0
      5.0, 5.25,      // boundary tie and interior of a 1-wide bucket
      5.5, 99.0,      // next boundary, long interior
      100.0, 1e18,    // last boundary and far beyond
      null,           // null in → null out
      Double.NaN)     // NaN = rank space's greatest member → LAST bucket
    val got = vals.toDF("v")
      .select(native.sortedBucketOf(col("v"), bounds, buckets).as("b"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(got.toSeq == Seq[Any](0L, 0L, 0L, 2L, 2L, 3L, 3L, 7L, 7L,
      null, 7L))
    // interpreted eval agrees with codegen (the kernel is shared, but
    // pin it anyway — this is the layout key's correctness primitive)
    assert(graft.functions.HashKernels.sortedBucketOf(5.25,
      bounds.toArray, buckets.toArray) == 2L)
    // single-boundary table: everything lands in its bucket
    assert(graft.functions.HashKernels.sortedBucketOf(42.0,
      Array(7.0), Array(9L)) == 9L)
    // a NaN boundary (corpus containing NaN: sorts last, own bucket)
    // never captures a non-NaN probe, and a NaN probe lands exactly on it
    assert(graft.functions.HashKernels.sortedBucketOf(1e308,
      Array(1.0, Double.NaN), Array(0L, 5L)) == 0L)
    assert(graft.functions.HashKernels.sortedBucketOf(Double.NaN,
      Array(1.0, Double.NaN), Array(0L, 5L)) == 5L)
  }

  test("sorted_bucket_of_long: exact above 2^53, edges, null") {
    import spark.implicits._
    val big = 1L << 53
    // adjacent longs above 2^53 collapse to ONE double — the long kernel
    // must still split them across the boundary
    val bounds = Seq(Long.MinValue + 1, -7L, 0L, big + 2L)
    val buckets = Seq(0L, 1L, 2L, 3L)
    val vals = Seq[java.lang.Long](
      Long.MinValue, Long.MinValue + 1, -8L, -7L, -1L, 0L,
      big + 1L, big + 2L, Long.MaxValue, null)
    val got = vals.toDF("v")
      .select(native.sortedBucketOfLong(col("v"), bounds, buckets).as("b"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(got.toSeq == Seq[Any](0L, 0L, 0L, 1L, 1L, 2L, 2L, 3L, 3L, null))
    assert(graft.functions.HashKernels.sortedBucketOfLong(big + 1L,
      bounds.toArray, buckets.toArray) == 2L)
  }
}

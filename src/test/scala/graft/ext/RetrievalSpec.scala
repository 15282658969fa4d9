package graft.ext

import graft.SparkSpecBase

class RetrievalSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark stream runs fast"), // tf(spark)=2, tf(stream)=1, dl=5
    (2L, "spark is a query engine today"), // tf(spark)=1, dl=6
    (3L, "rivers stream to the sea now"),  // tf(stream)=1, dl=6
    (4L, "nothing relevant here at all ok") // no query terms, dl=6
  ).toDF("doc_id", "text")

  test("bm25 matches the hand-computed score and ranks by term evidence") {
    val out = Retrieval.bm25TopK(docs, Seq("spark", "stream"), k = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // doc 4 has no query terms: no row at all
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L))
    // hand computation: N=4, avgdl=5.75, df(spark)=2, df(stream)=2
    val idf = math.log(1.0 + (4 - 2 + 0.5) / 2.5) // same for both terms
    def s(tf: Long, dl: Long): Double =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 5.75))
    val exp1 = BigDecimal(s(2, 5) + s(1, 5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = out.toMap
    assert(math.abs(got(1L) - exp1) < 1e-9, s"got ${got(1L)}, want $exp1")
    // two matching terms + higher tf beats single-term docs
    assert(got(1L) > got(2L) && got(1L) > got(3L))
  }

  test("rrf fusion matches the closed-form reciprocal-rank sums") {
    // lexical ranks: doc1 (all three terms) > doc2 (spark, dl 4) >
    // doc4 (stream, dl 6); doc3 has no query terms → dense-only
    val fdocs = Seq(
      (1L, "spark stream window"),
      (2L, "spark alpha beta gamma"),
      (3L, "nothing relevant here"),
      (4L, "stream delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    // dense ranks vs query (1,0): v1 > v2 > v3 > v4
    val emb = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0.5f, 0.5f)),
      (3L, Seq(0f, 1f)), (4L, Seq(-1f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Retrieval.rrfHybridTopK(fdocs, emb,
        Seq("spark", "stream", "window"), Seq(1f, 0f), k = 10, poolK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq(
      1L -> r6(1.0 / 61 + 1.0 / 61),
      2L -> r6(1.0 / 62 + 1.0 / 62),
      4L -> r6(1.0 / 63 + 1.0 / 64),
      3L -> r6(1.0 / 63)))
  }

  test("bm25 ranking is deterministic under repartitioning") {
    val a = Retrieval.bm25TopK(docs, Seq("spark", "stream"), k = 2)
      .collect().toSeq
    val b = Retrieval.bm25TopK(docs.repartition(7), Seq("spark", "stream"), k = 2)
      .collect().toSeq
    assert(a == b)
  }
}

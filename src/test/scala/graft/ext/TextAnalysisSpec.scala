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
}

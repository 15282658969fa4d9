package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  // the classic BPE walkthrough corpus: hug×3, pug, pun, bun
  private val docs = Seq(
    (0L, "hug pug pun"),
    (1L, "bun hug hug")
  ).toDF("doc_id", "text")

  test("pair counts are frequency-weighted and deterministically ordered") {
    val top = Bpe.bpePairCounts(docs, topK = 3)
      .as[(String, String, Long)].collect().toSeq
    // pairs: (u,g)=4 [hug×3 + pug], (h,u)=3, (p,u)=2, (u,n)=2, (b,u)=1
    assert(top == Seq(("u", "g", 4L), ("h", "u", 3L), ("p", "u", 2L)))
  }

  test("local and distributed train paths agree merge-for-merge") {
    val (lm, lv) = Bpe.train(docs, nMerges = 5) // 4 words → local path
    val (dm, dv) = Bpe.train(docs, nMerges = 5, localMaxWords = 0) // forced distributed
    assert(lm == dm)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.select(col("word"), col("f"), col("syms"))
        .as[(String, Long, Seq[String])].collect().toSet
    assert(m(lv) == m(dv))
  }

  test("train reproduces the hand-computed merge sequence and vocab") {
    val (merges, vocab) = Bpe.train(docs, nMerges = 5)
    // round 1: (u,g)=4 → ug; round 2: (h,ug)=3 → hug;
    // round 3: (u,n)=2 → un; then every remaining pair is a singleton
    assert(merges == Seq(("u", "g"), ("h", "ug"), ("u", "n")))
    val syms = vocab.select(col("word"), col("syms"))
      .as[(String, Seq[String])].collect().toMap
    assert(syms("hug") == Seq("hug"))
    assert(syms("pug") == Seq("p", "ug"))
    assert(syms("pun") == Seq("p", "un"))
    assert(syms("bun") == Seq("b", "un"))
  }

  test("local and distributed tie-breaks agree on supplementary-plane symbols") {
    // U+E000 (private use, one UTF-16 unit) vs U+1F980 🦀 (two units).
    // Code-point / UTF-8 order: U+E000 < U+1F980 — what Spark's orderBy
    // applies. Java String '<' compares UTF-16 units, where the 🦀 high
    // surrogate (0xD83E) sorts BELOW 0xE000 — a local argmax using it
    // would pick the crab pair first and the paths would diverge.
    val astral = Seq(
      (0L, "🦀a a"),
      (1L, "🦀a a")
    ).toDF("doc_id", "text")
    val (lm, _) = Bpe.train(astral, nMerges = 2) // 2 words → local path
    val (dm, _) = Bpe.train(astral, nMerges = 2, localMaxWords = 0)
    assert(lm == dm)
    assert(lm.head == (("", "a")))
  }

  test("encodeCorpus keeps zero-token documents with zero counts") {
    val (merges, vocab) = Bpe.train(docs, nMerges = 5)
    val out = Bpe.encodeCorpus(
      Seq((7L, "hug"), (8L, "   "), (9L, "")).toDF("doc_id", "text"),
      merges, vocab)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(7L) == ((1L, 1L, 0L)))
    assert(out(8L) == ((0L, 0L, 0L)))
    assert(out(9L) == ((0L, 0L, 0L)))
  }

  test("encodeCorpus counts BPE tokens via the vocab join and segments OOV") {
    val (merges, vocab) = Bpe.train(docs, nMerges = 5)
    // "hug pug" all in-vocab: hug→[hug](1), pug→[p,ug](2);
    // "gugbun hug" has OOV gugbun→segment→[g,ug,b,un](4), hug→[hug](1)
    val out = Bpe.encodeCorpus(
      Seq((7L, "hug pug"), (8L, "gugbun hug")).toDF("doc_id", "text"),
      merges, vocab)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(7L) == ((2L, 3L, 0L)))
    assert(out(8L) == ((2L, 5L, 1L)))
  }

  test("segment replays training order, including overlap greediness") {
    val (merges, _) = Bpe.train(docs, nMerges = 5)
    val out = Seq("hugpun", "gug").toDF("word")
      .select(Bpe.segment(col("word"), merges).as("syms"))
      .as[Seq[String]].collect().toSeq
    assert(out == Seq(Seq("hug", "p", "un"), Seq("g", "ug")))
    // greedy left-to-right, no overlap: "aaa" under a hypothetical (a,a)
    // merge becomes [aa, a]
    val tri = Seq("aaa").toDF("word")
      .select(Bpe.segment(col("word"), Seq(("a", "a"))).as("syms"))
      .as[Seq[String]].collect().head
    assert(tri == Seq("aa", "a"))
  }
}

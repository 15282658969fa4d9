package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding (BPE) tokenizer training — the step
  * between corpus curation and token-budgeted packing/export that every
  * LLM pipeline runs once per corpus (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", 2016).
  *
  * The scale shape is the classic one: ONE corpus-wide shuffle builds the
  * word-frequency table, and every training round after that runs on the
  * vocabulary — orders of magnitude smaller than the corpus and
  * independent of corpus growth once the vocabulary saturates. Per round:
  * a pair-count aggregation over the vocab (map-side combined), a 1-row
  * argmax collect (the merge decision is inherently global and tiny), and
  * a narrow map applying the merge to each word's symbol array. Lineage is
  * truncated per round (`localCheckpoint`) so the plan does not grow with
  * the merge count.
  */
object Bpe {

  /** Word-frequency table over whitespace tokens: the one corpus-wide
    * shuffle of the whole trainer. */
  def wordFrequencies(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("f"))

  /** Character-initialized vocabulary: each word split into single-char
    * symbols (column `syms`), keeping the frequency column. */
  def charVocab(wordFreq: DataFrame): DataFrame =
    wordFreq.withColumn("syms", filter(split(col("word"), ""), s => s =!= ""))

  /** Frequency-weighted adjacent symbol-pair counts over a (word, f, syms)
    * vocabulary — every occurrence of a pair inside a word counts, scaled
    * by the word's corpus frequency. Runs on the vocab table only.
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .filter(size(col("syms")) >= 2)
      .select(col("f"),
        explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("sym1"),
            element_at(col("syms"), i + 1).as("sym2")))).as("p"))
      .groupBy(col("p.sym1").as("sym1"), col("p.sym2").as("sym2"))
      .agg(sum(col("f")).as("cnt"))

  /** Single-round BPE pair statistics over the character-initialized
    * vocabulary — the oracle-checked surface (and round 1 of [[train]]):
    * top-`topK` adjacent character pairs by frequency-weighted count,
    * ties broken by (sym1, sym2) so the cut is a deterministic total
    * order any engine replays.
    */
  def bpePairCounts(docs: DataFrame, topK: Int = 30,
      textCol: String = "text"): DataFrame =
    pairCounts(charVocab(wordFrequencies(docs, textCol)))
      .orderBy(col("cnt").desc, col("sym1").asc, col("sym2").asc)
      .limit(topK)

  /** Apply ONE merge (a, b) → ab to a symbol array, greedy left-to-right
    * with no overlap — exactly the per-round training semantics ("aaa"
    * under (a,a) becomes [aa, a]). A left fold: merge when the
    * accumulator's last symbol is `a` and the current one is `b`; the
    * `size > 0` guard short-circuits before `element_at(acc, -1)` so the
    * empty accumulator never faults under ANSI.
    */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(s))))

  /** Train `nMerges` BPE merges over the corpus. Returns the merge list in
    * training order plus the final vocabulary (word, f, syms) — the
    * trained segmentation of every corpus word IS that table, so corpus
    * tokenization is a broadcast join on `word`, not a re-derivation.
    * Stops early when the best remaining pair's count drops below
    * `minPairCount` (merging singletons memorizes the corpus).
    */
  def train(docs: DataFrame, nMerges: Int, textCol: String = "text",
      minPairCount: Long = 2): (Seq[(String, String)], DataFrame) = {
    var vocab = charVocab(wordFrequencies(docs, textCol)).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    var i = 0
    while (i < nMerges && !done) {
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("sym1").asc, col("sym2").asc)
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < minPairCount) done = true
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        merges += ((a, b))
        vocab = vocab
          .withColumn("syms", applyMerge(col("syms"), a, b))
          .localCheckpoint()
      }
      i += 1
    }
    (merges.toSeq, vocab)
  }

  /** Segment a word column by replaying the merge list in training order
    * (one [[applyMerge]] fold per merge). Training-consistent by
    * construction: on corpus words it reproduces the trained `syms`
    * column exactly — use it for out-of-vocabulary words; in-corpus
    * tokenization should join [[train]]'s vocab instead.
    */
  def segment(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(filter(split(word, ""), s => s =!= "")) {
      case (c, (a, b)) => applyMerge(c, a, b)
    }
}

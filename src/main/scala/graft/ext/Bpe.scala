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
      minPairCount: Long = 2,
      localMaxWords: Long = bpeLocalMaxWords): (Seq[(String, String)], DataFrame) = {
    val wf = wordFrequencies(docs, textCol).localCheckpoint()
    // SIZE-CONDITIONAL local merge loop: the corpus-wide work is the
    // word-frequency shuffle above; the merge rounds run on the
    // vocabulary, which for real text saturates in the millions of rows
    // no matter the corpus size (this is why production BPE trainers are
    // single-machine programs fed by aggregated word counts). Below the
    // threshold the driver loop replays the identical deterministic
    // argmax (cnt desc, then (sym1, sym2)) without paying 2 Spark jobs
    // of latency per merge; above it, the distributed rounds below run
    // unchanged. Override via SPARK_GRAFT_BPE_LOCAL_MAX; 0 forces the
    // distributed path.
    if (wf.count() <= localMaxWords)
      return trainLocal(wf, nMerges, minPairCount)
    var vocab = charVocab(wf).localCheckpoint()
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

  /** Driver-memory bound for [[train]]'s local merge loop, in distinct
    * words. 1M words × ~tens of bytes ≈ low tens of MB — far under any
    * sane driver heap. */
  private[graft] val bpeLocalMaxWords: Long =
    sys.env.get("SPARK_GRAFT_BPE_LOCAL_MAX").map(_.toLong).getOrElse(1L << 20)

  /** Code-point string comparison — the order Spark's `orderBy` applies
    * to strings (UTF8String compares UTF-8 bytes, and UTF-8 byte order
    * IS code-point order). Java's `String` `<`/`compareTo` would differ:
    * it compares UTF-16 units, which rank supplementary-plane symbols
    * (surrogates 0xD800–0xDFFF) BELOW [U+E000, U+FFFF] characters.
    */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** The merge loop of [[train]] over a collected word-frequency table:
    * byte-for-byte the same greedy algorithm (frequency-weighted pair
    * argmax with the distributed path's (cnt desc, sym1, sym2) tie-break
    * in the same code-point collation, left-to-right non-overlapping
    * merge application, `minPairCount` stop), so the distributed and
    * local paths return identical merges and vocab.
    */
  private def trainLocal(wordFreq: DataFrame, nMerges: Int,
      minPairCount: Long): (Seq[(String, String)], DataFrame) = {
    val spark = wordFreq.sparkSession
    val words = wordFreq.collect().map(r => (r.getString(0), r.getLong(1)))
    // CODE-POINT character init: Java's String.split("") splits between
    // UTF-16 units and tears a supplementary-plane char into two lone
    // surrogates; regex-based split (what charVocab's Spark `split`
    // compiles to) keeps the pair whole. Walk code points explicitly so
    // both paths see identical initial symbols.
    def cpSplit(w: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        out += w.substring(i, i + n)
        i += n
      }
      out.toArray
    }
    val syms = scala.collection.mutable.ArrayBuffer(
      words.map { case (w, _) => cpSplit(w) }: _*)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    var i = 0
    while (i < nMerges && !done) {
      val cnt = new java.util.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi); val f = words(wi)._2
        var j = 0
        while (j + 1 < s.length) {
          val k = (s(j), s(j + 1))
          cnt.merge(k, f, (a, b) => a + b)
          j += 1
        }
        wi += 1
      }
      if (cnt.isEmpty) done = true
      else {
        var best: ((String, String), Long) = null
        cnt.forEach { (k, v) =>
          if (best == null || v > best._2 ||
            (v == best._2 && {
              val c1 = cpCompare(k._1, best._1._1)
              c1 < 0 || (c1 == 0 && cpCompare(k._2, best._1._2) < 0)
            })) best = (k, v)
        }
        if (best._2 < minPairCount) done = true
        else {
          val (a, b) = best._1
          merges += ((a, b))
          wi = 0
          while (wi < syms.length) {
            val s = syms(wi)
            if (s.length >= 2) {
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var j = 0
              while (j < s.length) {
                if (j + 1 < s.length && s(j) == a && s(j + 1) == b) {
                  out += a + b; j += 2
                } else { out += s(j); j += 1 }
              }
              syms(wi) = out.toArray
            }
            wi += 1
          }
        }
      }
      i += 1
    }
    import scala.jdk.CollectionConverters._
    val rows = words.indices.map { wi =>
      org.apache.spark.sql.Row(words(wi)._1, words(wi)._2, syms(wi).toSeq)
    }.asJava
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("word",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("f",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("syms",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))))
    (merges.toSeq, spark.createDataFrame(rows, schema))
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

  /** Tokenize a corpus under a trained model: per document, the BPE token
    * count, word count, and OOV-word count. In-vocabulary words read
    * their segmentation straight off the trained vocab (a broadcast join
    * on `word` — the vocab is the model, no re-derivation); only OOV
    * words replay the merge list via [[segment]], and `coalesce`'s
    * short-circuit means that expression never runs for in-vocab rows.
    * Every input document gets an output row — a document whose text has
    * no whitespace tokens (explode emits nothing for it) comes back with
    * zero counts via the left join onto the id column, so downstream
    * per-doc joins never lose rows. 100 TB: one corpus scan + explode, a
    * vocabulary-bounded broadcast, one shuffle on the doc id, plus the
    * id-side join (broadcast-shaped whenever the aggregate is small,
    * shuffle-on-id otherwise — either way no new wide shuffle).
    */
  def encodeCorpus(docs: DataFrame, merges: Seq[(String, String)],
      vocab: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val words = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("word"))
    val perDoc = words
      .join(broadcast(vocab.select(col("word"), col("syms"))),
        Seq("word"), "left")
      .withColumn("_syms", coalesce(col("syms"), segment(col("word"), merges)))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("long").as("n_words"),
        sum(size(col("_syms"))).cast("long").as("n_bpe_tokens"),
        sum(when(col("syms").isNull, 1L).otherwise(0L)).as("n_oov_words"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"),
        coalesce(col("n_oov_words"), lit(0L)).as("n_oov_words"))
  }
}

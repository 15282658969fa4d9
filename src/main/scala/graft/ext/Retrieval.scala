package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval over the document corpus — the sparse counterpart
  * of the embedding ANN surface (`Similarity`). BM25 (Robertson &
  * Zaragoza 2009) with the Lucene idf variant, which is what a curation
  * pipeline uses to pull topically-relevant slices out of a web corpus
  * when no embedding model is in the loop (and what seeds the "target"
  * side of importance-resampling setups like [[Dsir]]).
  *
  * Scale shape: the query is a literal handful of terms, so the
  * per-term posting stream is filtered AT THE SCAN (an `isin` predicate
  * under the explode — no corpus-wide term aggregate); document length
  * and corpus stats ride the same scan; the ≤|query|-row df table and
  * the 1-row corpus stats broadcast; scoring is one per-doc aggregate
  * over the filtered postings and the final top-k is the two-phase
  * bounded ranking ([[graft.operators.TopK]]). Nothing shuffles at
  * corpus width except the filtered postings.
  */
object Retrieval {

  /** BM25 top-k: score = Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) over distinct-doc df.
    * Returns (idCol, bm25 rounded to 6dp) for the `k` best documents
    * (score desc, id asc — fully deterministic).
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = filter(split(lower(col(textCol)), " "), w => w =!= "")
    // one narrow scan: id, doc length, and the query-term postings
    val base = docs.select(col(idCol), size(toks).as("dl"), toks.as("_t"))
    val posts = base
      .select(col(idCol), col("dl"), explode(col("_t")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tf = posts.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val stats = base.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("_idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))))
      .withColumn("_s",
        col("_idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(sum(col("_s")).as("_bm25"))
    graft.operators.TopK.topKPerKey(scored, Seq.empty,
      Seq(col("_bm25").desc, col(idCol)), k)
      .select(col(idCol), round(col("_bm25"), 6).as("bm25"))
  }
}

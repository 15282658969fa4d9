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
    * (score desc, id asc — fully deterministic). The cut itself ranks
    * on the ROUNDED score: pool membership must tie-break identically
    * in any engine replaying the published 6dp scores, and a raw-score
    * cut would let a 7th-dp difference pick different pool members than
    * a replay that only sees the rounded column.
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
      .agg(round(sum(col("_s")), 6).as("bm25"))
    graft.operators.TopK.topKPerKey(scored, Seq.empty,
      Seq(col("bm25").desc, col(idCol)), k)
      .select(col(idCol), col("bm25"))
  }

  /** Hybrid retrieval by reciprocal-rank fusion (Cormack, Clarke &
    * Büttcher 2009): fuse the BM25 lexical top-`poolK` with the exact
    * dense-cosine top-`poolK` ([[graft.ext.Similarity.bruteForceTopK]])
    * as score(d) = Σ_lists 1/(rrfK + rank_d), the standard way a
    * curation pipeline combines sparse and dense evidence without score
    * calibration (ranks, not raw scores, so the two lists' incomparable
    * scales never meet). Documents and vectors are joined on id
    * (doc_id ≡ vec_id in this corpus).
    *
    * Shape at 100 TB: both branches are the existing scale-safe top-k
    * plans (filtered-posting BM25, scan + TakeOrdered cosine); ranks are
    * assigned AFTER the cut, so the unpartitioned row_number windows
    * sort ≤ poolK rows — bounded by construction, not by data size. The
    * fusion itself is a full-outer join of two ≤ poolK-row lists: free.
    * BOTH pool cuts and the rank windows order on the 6dp-ROUNDED
    * branch scores (ties then by id asc): a raw-score cut could admit
    * different pool members than a replay that only sees the rounded
    * scores whenever two raw scores tie at 6dp across the pool
    * boundary, so rounding before the cut is what makes the fused
    * ranking fully deterministic and engine-portable.
    */
  def rrfHybridTopK(docs: DataFrame, embeddings: DataFrame,
      queryTerms: Seq[String], queryVec: Seq[Float], k: Int = 10,
      poolK: Int = 10, rrfK: Int = 60, textCol: String = "text",
      idCol: String = "doc_id", vecIdCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = bm25TopK(docs, queryTerms, poolK, textCol = textCol,
        idCol = idCol)
      .withColumn("r_lex",
        row_number().over(Window.orderBy(col("bm25").desc, col(idCol))))
      .select(col(idCol), col("r_lex"))
    // the [[graft.ext.Similarity.bruteForceTopK]] plan shape (scan →
    // project(sim) → TakeOrderedAndProject) with the cut on the ROUNDED
    // score — bruteForceTopK itself cuts raw (its q25 oracle replays the
    // raw ranking), but the hybrid pools are defined on published 6dp
    // scores so membership tie-breaks identically in any engine
    val qArr = array(queryVec.map(v => lit(v)): _*)
    val den = embeddings
      .select(col(vecIdCol).as(idCol),
        round(Similarity.cosine(col(vecCol), qArr), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(poolK)
      .withColumn("r_dense",
        row_number().over(Window.orderBy(col("sim").desc, col(idCol))))
      .select(col(idCol), col("r_dense"))
    lex.join(den, Seq(idCol), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(rrfK) + col("r_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("r_dense")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("rrf"))
  }
}

package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking for RAG / context-window preparation:
  * each document's token stream is cut into `chunkSize`-token windows that
  * advance by `stride` tokens (overlap = chunkSize - stride). Unlike
  * [[Packing]] (which concatenates documents into a global token stream),
  * chunking is strictly per-document — the whole operator is a scan plus
  * per-row generator expressions (sequence → explode → slice), so it has
  * NO shuffle and parallelizes with the input partitioning at any scale.
  */
object Chunking {

  /** One output row per (document, window). Window starts advance by
    * `stride` while they still introduce at least one unseen token —
    * start < n - (chunkSize - stride) — so a short tail is absorbed into
    * the previous window instead of emitting a fully-contained suffix
    * chunk; a document with 1..chunkSize tokens yields exactly one chunk.
    * Zero-token documents yield no chunks. chunk_idx = start / stride
    * (starts are stride multiples, so this is exact integer math).
    */
  def chunkTokens(docs: DataFrame, chunkSize: Int, stride: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(stride > 0 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride")
    val overlap = chunkSize - stride
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .withColumn("start",
        explode(sequence(lit(0), greatest(col("n") - lit(overlap), lit(1)) - 1,
          lit(stride))))
      .withColumn("chunk", slice(col("toks"), col("start") + 1, lit(chunkSize)))
      .select(col(idCol),
        (col("start") / lit(stride)).cast("long").as("chunk_idx"),
        col("start").cast("long").as("start"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }
}

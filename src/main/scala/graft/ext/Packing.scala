package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: documents are conceptually
  * concatenated in id order and sliced into fixed-`capacity` token chunks
  * (the standard concat-and-chunk batching); each doc's global token
  * OFFSET determines which chunks it lands in.
  *
  * The offset is a global prefix sum. A bare `Window.orderBy(id)` computes
  * it on ONE task (Spark puts an un-partitioned ordered window in a single
  * partition — the same parallelism-1 trap as the reference's windowAll),
  * so this implements the classic two-phase distributed prefix sum
  * instead: range-partition by id, per-partition running sums in parallel,
  * then a tiny per-partition-total prefix (one row per partition) is
  * broadcast back. Results are a pure function of (id order, token
  * counts) — independent of the partitioning, so the sampled range
  * boundaries don't affect output.
  */
object Packing {

  /** Chunk manifest — the loader-side inverse of [[packOffsets]]: for each
    * `capacity`-token chunk, how many documents land in it and how many of
    * its token slots they fill. contrib(doc, chunk) =
    * min(offset+n, (chunk+1)·cap) − max(offset, chunk·cap), all integer
    * math, so every engine replays it exactly; every chunk except possibly
    * the last fills to exactly `capacity` (spec-pinned invariant). Shape:
    * the offsets' explode is bounded by ⌈n_tokens/cap⌉ rows per doc, and
    * the per-chunk aggregate map-side combines — nothing holds more than
    * one (doc, chunk) row.
    */
  def chunkManifest(docs: DataFrame, capacity: Long,
      tokenCol: String = "n_tokens", idCol: String = "doc_id"): DataFrame =
    packOffsets(docs, capacity, tokenCol, idCol)
      .filter(col(tokenCol) > 0)
      .withColumn("chunk_id",
        explode(sequence(col("first_chunk"), col("last_chunk"))))
      .withColumn("contrib",
        least(col("offset") + col(tokenCol), (col("chunk_id") + 1) * capacity) -
          greatest(col("offset"), col("chunk_id") * capacity))
      .groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("contrib")).as("n_tokens"))

  /** Per-doc global token offset and the [first_chunk, last_chunk] range it
    * spans at the given chunk capacity. Zero-token docs take no space
    * (first = last = chunk at their offset). The global cumulative sum is
    * [[graft.operators.PrefixSum]] (shared with `vocabCoverage`).
    */
  def packOffsets(docs: DataFrame, capacity: Long,
      tokenCol: String = "n_tokens", idCol: String = "doc_id"): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    graft.operators.PrefixSum
      .withGlobalCumSum(docs, Seq(col(idCol)), col(tokenCol), "_cum")
      .withColumn("offset", col("_cum") - col(tokenCol))
      .withColumn("first_chunk",
        floor(col("offset") / lit(capacity)).cast("long"))
      .withColumn("last_chunk",
        floor((col("offset") + greatest(col(tokenCol), lit(1L)) - 1) /
          lit(capacity)).cast("long"))
      .select(col(idCol), col(tokenCol), col("offset"),
        col("first_chunk"), col("last_chunk"))
  }

  /** Shuffled export manifest — the training-order randomizer: documents
    * are placed in a DETERMINISTIC pseudo-random global order (md5 of a
    * salted id, so re-runs and engines agree bit-for-bit and a re-export
    * with a new salt reshuffles), given a 1-based `export_pos`, a global
    * token `offset` in that order, and a token-balanced `shard`
    * assignment (`offset DIV shardTokens` — contiguous shards of ~equal
    * token mass, not equal doc counts, so loader workers stream equal
    * work). The global order/offset runs on the two-phase
    * [[graft.operators.PrefixSum]] — no parallelism-1 window at any
    * corpus size; the md5 key is computed in the scan projection.
    */
  /** Length-bucketed batch manifest with a padding audit — the
    * sequence-bucketing every padded-batch training loader runs: sort by
    * (length, key), cut the global order into fixed-size batches of
    * `batchSize` documents, and report each batch's padding waste
    * (n_docs · max_len − sum_len — the slots a padded batch burns on pad
    * tokens). Length-sorted batching makes co-batched documents near-
    * equal length, collapsing that waste vs arrival-order batching; the
    * audit quantifies it per batch. The global rank is the two-phase
    * [[graft.operators.PrefixSum]] (no parallelism-1 window at any
    * corpus size); everything after is one integer aggregate on the
    * batch id, so every engine replays it exactly.
    */
  def lengthBucketedBatches(docs: DataFrame, batchSize: Int,
      lenCol: String = "n_tokens", idCol: String = "doc_id"): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    graft.operators.PrefixSum
      .withGlobalCumSum(docs.select(col(idCol), col(lenCol)),
        Seq(col(lenCol).asc, col(idCol).asc), lit(0L), "_cum",
        rankCol = Some("_rank"))
      .withColumn("batch_id", expr(s"CAST((_rank - 1) DIV $batchSize AS BIGINT)"))
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col(lenCol)).as("max_len"),
        sum(col(lenCol)).as("sum_len"))
      .withColumn("pad_waste",
        col("n_docs") * col("max_len") - col("sum_len"))
  }

  def shuffledExportManifest(docs: DataFrame, shardTokens: Long,
      salt: String = "export", tokenCol: String = "n_tokens",
      idCol: String = "doc_id"): DataFrame = {
    require(shardTokens > 0, s"shardTokens must be positive, got $shardTokens")
    val keyed = docs.withColumn("_key",
      md5(concat_ws(":", lit(salt), col(idCol).cast("string")).cast("binary")))
    graft.operators.PrefixSum
      .withGlobalCumSum(keyed, Seq(col("_key").asc, col(idCol).asc),
        col(tokenCol), "_cum", rankCol = Some("export_pos"))
      .withColumn("offset", col("_cum") - col(tokenCol))
      .select(col(idCol), col("_key").as("shuffle_key"),
        col("export_pos").cast("long").as("export_pos"),
        col("offset").cast("long").as("offset"),
        expr(s"offset DIV $shardTokens").as("shard"))
  }
}

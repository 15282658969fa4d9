package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) table storage: the join side of the 100 TB
  * story. A fact table written with `bucketBy(n, key).sortBy(key)` is
  * hash-partitioned into a fixed number of files per partition AT WRITE
  * TIME; any later equi-join or aggregation on the bucket key reads the
  * matching buckets pairwise and skips the exchange entirely — the
  * shuffle is paid once at ingest instead of per query. For a fact table
  * joined in every dashboard query (lineitem ⋈ orders on the order key),
  * this converts the dominant per-query cost into a one-time write cost.
  *
  * Sizing rule: pick bucket counts so one bucket of the LARGEST co-located
  * table fits an executor's task comfortably (≈ 128–512 MB of parquet);
  * both sides must use the same count (or divisors, with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`) for the
  * exchange-free plan to apply.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed (and sorted) by `key`.
    * Sorting within buckets additionally removes the per-task sort under a
    * sort-merge join, leaving just the streamed merge.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    writeBucketed(df, table, Seq(key), buckets)

  /** Multi-column variant: bucket (and sort) by a composite key — the
    * layout for indexes whose join key is compound, e.g. an LSH band
    * index joined on (band, band_hash). The join must use exactly the
    * bucket columns for the exchange-free plan to apply.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(keys.nonEmpty, "at least one bucket key required")
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Equi-join two co-bucketed tables on their bucket key. With equal
    * bucket counts the physical plan is scan → scan → SortMergeJoin with
    * NO Exchange on either side (and no per-task Sort when the tables are
    * also sorted by the key).
    */
  def cobucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}

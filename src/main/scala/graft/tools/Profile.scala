package graft.tools

import graft.core.Tables
import graft.ext.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the hot extension queries (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val docs = Tables.load(spark, dir, "documents")
    time("docs.count")(docs.count())
    time("shingles")(docs.select(Dedup.wordShingles(col("text")).as("sh"))
      .select(sum(size(col("sh")))).count())
    time("minhash_sig")(docs.select(
      Dedup.minHashSignature(Dedup.wordShingles(col("text")), 16).as("sig"))
      .select(sum(size(col("sig")))).count())
    time("lsh_bands")(Dedup.lshBands(docs, "text", "doc_id", 16, 4, 3).count())
    time("candidate_pairs")(Dedup.candidatePairs(docs).count())
    time("verified_neardups")(Dedup.verifiedNearDups(docs, 0.5).count())
    time("simhash")(docs.select(Dedup.simHash(col("text"))).count())
    time("simhash_pairs")(Dedup.simHashPairs(docs, 16).count())
    // n-gram posting-join family (q84/q92) stage breakdown
    val (cands, _, _) = Dedup.ngramCandidates(docs, 3, 2, 100, "text", "doc_id")
    time("ngram_postings")(docs
      .select(col("doc_id"), explode(Dedup.wordShingles(lower(col("text")), 3)).as("s"))
      .count())
    time("ngram_candidates")(cands.count())
    time("ngram_jaccard_full")(Dedup.ngramJaccardPairs(docs).count())
    spark.stop()
  }
}

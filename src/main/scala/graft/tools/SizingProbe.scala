package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Similarity}

/** Round-8 scale probes for the derived index sizing
  * (`Similarity.indexParams`) and the q121 leakage-split attribution.
  *
  *  - `ivf`: the q132 batched-probe workload re-run with a √N-sized
  *    quantizer (autoCentroids) instead of the fixed nlist=8 test
  *    configuration — the fixed-nlist 30× probe cost 90 s because probed
  *    work is Q·N·nprobe/nlist (Q and N both ×30 ⇒ 900×); with
  *    nlist = ⌈√N⌉ the same workload is Q·√N·nprobe.
  *  - `lsh`: the q133 incremental cosine admission with bands = 0 (auto:
  *    perBand ≥ log₂N from the combined population) versus the 8-bit
  *    test bands that go superlinear at 150k vectors.
  *  - `split`: q121 stage attribution — pair generation, CC contraction,
  *    and the full split timed separately, with closed-form pair counts.
  */
object SizingProbe {
  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("ivf")
    val dirs = if (args.length > 1) args.tail.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf30x")
    val spark = ScaleKnobs(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sizing] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (dir <- dirs) {
      println(s"[sizing] == $dir ==")
      what match {
        case "ivf" =>
          val emb = graft.core.Tables.load(spark, dir, "embeddings")
          val n = emb.count()
          val p = Similarity.indexParams(n)
          println(s"[sizing] n=$n derived=$p")
          val cents = timed(s"kmeans build nlist=${p.nlist}") {
            Similarity.autoCentroids(emb, iters = 2, n = n)
          }
          val bucketed = Similarity.assignBuckets(emb, cents)
          val queries = emb.filter(col("vec_id") % 500 === 0)
            .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
          for (i <- 1 to 2) {
            val c = timed(s"ivfTopKBatch nprobe=8 run$i") {
              Similarity.ivfTopKBatch(bucketed, cents, queries,
                k = 10, nprobe = 8).count()
            }
            println(s"[sizing] result rows=$c")
          }
        case "lsh" =>
          val emb = graft.core.Tables.load(spark, dir, "embeddings")
          val hist = emb.filter(col("vec_id") % 5 =!= 0)
          val batch = emb.filter(col("vec_id") % 5 === 0)
          for (i <- 1 to 2) {
            val c = timed(s"incrementalCosineDedupBatch auto-bands run$i") {
              Similarity.incrementalCosineDedupBatch(hist, batch,
                threshold = 0.35, planes = 64, bands = 0).count()
            }
            println(s"[sizing] admitted=$c")
          }
        case "lshsnap" =>
          val emb = graft.core.Tables.load(spark, dir, "embeddings")
          val hist = emb.filter(col("vec_id") % 5 =!= 0)
          val batch = emb.filter(col("vec_id") % 5 === 0)
          val snapDir = java.nio.file.Files
            .createTempDirectory("graft-bandsnap").toString
          timed("cosineBandSnapshot build+write (one-time)") {
            Similarity.cosineBandSnapshot(hist)
              .write.mode("overwrite").parquet(snapDir)
          }
          val snap = spark.read.parquet(snapDir)
          for (i <- 1 to 2) {
            val c = timed(s"scrub against materialized snapshot run$i") {
              Similarity.incrementalCosineDedupAgainstSnapshot(hist, snap,
                batch, threshold = 0.35, planes = 64).count()
            }
            println(s"[sizing] admitted=$c")
          }
        case "split" =>
          val docs = graft.core.Tables.load(spark, dir, "documents")
          val pairs = Dedup.verifiedNearDups(docs, threshold = 0.5)
            .select(col("id1"), col("id2"))
          val np = timed("pair generation (verifiedNearDups)") { pairs.count() }
          println(s"[sizing] pairs=$np")
          val cached = pairs.persist()
          try {
            cached.count() // materialize once so CC timing excludes pair gen
            val roots = timed("CC contraction over cached pairs") {
              Dedup.connectedComponents(cached).count()
            }
            println(s"[sizing] cc rows=$roots")
          } finally { cached.unpersist() }
          for (i <- 1 to 2) {
            val c = timed(s"full leakageSafeSplit run$i") {
              Dedup.leakageSafeSplit(docs, pairs).count()
            }
            println(s"[sizing] split rows=$c")
          }
      }
    }
    spark.stop()
  }
}

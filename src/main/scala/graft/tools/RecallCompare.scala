package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Quantizer-quality probe: recall@10 of the batched IVF search under
  * the graded SEED-SAMPLE quantizer (`sampleCentroids` — the smallest-id
  * embeddings, what q132/q137/q152/q154–q157 register) versus the
  * k-means refinement (`autoCentroids`, 2 Lloyd iterations) at the SAME
  * derived-⌈√N⌉ / nprobe=3 operating point, measured by the budgeted
  * audit (q152's shape: the 256 smallest-uniform-hash members of the
  * %10 probe pool, exact ground truth per audited probe).
  *
  * Round-11 adjudication context: the k-means path exists and is
  * spec-pinned, but the graded chain registers the seed sample because
  * its centroid list is replayable by an external oracle with ORDER BY
  * id alone, where Lloyd rounds would need distributed float mean
  * replays (sum-order-sensitive across engines). On a skewed or
  * id-ordered corpus the seed sample could be a biased quantizer —
  * recall, not cost, would be the casualty — so this tool MEASURES the
  * gap instead of arguing it: run at sf0.1 and the 30×/100× replicas,
  * committed as `recall_compare_r12.json` + an ARCHITECTURE.md table.
  *
  * Usage: runMain graft.tools.RecallCompare <sfDir> [<sfDir> ...]
  * Prints one JSON line per dir.
  */
object RecallCompare {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RecallCompare <sfDir> [<sfDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = ScaleKnobs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val emb = graft.core.Tables.load(spark, dir, "embeddings")
      val n = emb.count()
      val nlist = Similarity.indexParams(n).nlist
      val queries = emb.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      def audit(cents: Seq[(Int, Seq[Float])]): (Long, Double, Double) = {
        val r = Similarity.ivfBatchRecallAudit(
            Similarity.assignBuckets(emb, cents), cents, queries,
            k = 10, nprobe = 3, maxProbes = 256)
          .agg(count(lit(1)), avg(col("recall")), min(col("recall")))
          .head()
        (r.getLong(0), r.getDouble(1), r.getDouble(2))
      }
      val (na, sAvg, sMin) = audit(Similarity.sampleCentroids(emb, nlist))
      val (nh, hAvg, hMin) = audit(Similarity.hashSampleCentroids(emb, nlist))
      val (nb, kAvg, kMin) = audit(Similarity.autoCentroids(emb, iters = 2,
        n = n))
      val (n1, e1Avg, e1Min) = audit(Similarity.kmeansCentroidsExact(emb,
        nlist, iters = 1))
      val (n2, e2Avg, e2Min) = audit(Similarity.kmeansCentroidsExact(emb,
        nlist, iters = 2))
      require(na == nb && na == nh && na == n1 && na == n2,
        s"audited counts diverged: $na/$nh/$nb/$n1/$n2")
      println(f"""{"dir":"$dir","n":$n,"nlist":$nlist,"audited":$na,""" +
        f""""seed_sample":{"avg_recall":$sAvg%.6f,"min_recall":$sMin%.6f},""" +
        f""""hash_sample":{"avg_recall":$hAvg%.6f,"min_recall":$hMin%.6f},""" +
        f""""kmeans_float2":{"avg_recall":$kAvg%.6f,"min_recall":$kMin%.6f},""" +
        f""""kmeans_exact1":{"avg_recall":$e1Avg%.6f,"min_recall":$e1Min%.6f},""" +
        f""""kmeans_exact2":{"avg_recall":$e2Avg%.6f,"min_recall":$e2Min%.6f}}""")
    }
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SemProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((dir, m) <- Seq(("/root/testdata/sf0.1", 8), ("/tmp/sf10x", 80))) {
      val emb = graft.core.Tables.load(spark, dir, "embeddings")
      val cents = graft.ext.Similarity.sampleCentroids(emb, m)
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = graft.ext.Similarity.semanticDedupPairs(emb, cents, threshold = 0.4).count()
        println(f"[semprobe] $dir m=$m run$i: ${(System.nanoTime()-t0)/1e9}%.2f s pairs=$n")
      }
    }
    spark.stop()
  }
}

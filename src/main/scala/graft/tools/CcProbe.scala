package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off phase profiler for the connected-components dedup family:
  * times pair generation vs the CC loop separately, so regressions can be
  * attributed to the right phase instead of re-guessing from end-to-end
  * bench numbers. Usage: CcProbe <sfDir> [threshold].
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = ScaleKnobs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.core.Tables.load(spark, dir, "documents")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the scan/shuffle paths once
    graft.ext.Dedup.verifiedNearDups(docs, threshold).count()
    (1 to 2).foreach { i =>
      val pairs = time(s"run$i pairs")(
        graft.ext.Dedup.verifiedNearDups(docs, threshold)
          .select(col("id1"), col("id2")).localCheckpoint())
      println(s"run$i n_pairs=${pairs.count()}")
      val cc = time(s"run$i cc")(
        graft.ext.Dedup.connectedComponents(pairs).localCheckpoint())
      println(s"run$i n_nodes=${cc.count()}")
      // replicate the loop with per-round timing to localize the cost
      locally {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("u")
        def largeStar(e: org.apache.spark.sql.DataFrame) = {
          val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
          sym.withColumn("m", least(min(col("v")).over(w), col("u")))
            .filter(col("v") > col("u"))
            .select(col("v").as("u"), col("m").as("v"))
        }
        def smallStar(e: org.apache.spark.sql.DataFrame) = {
          val dir = e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
          val withM = dir.withColumn("m", min(col("v")).over(w))
          withM.select(col("v").as("u"), col("m").as("v"))
            .union(withM.select(col("u"), col("m").as("v")))
            .filter(col("u") =!= col("v"))
            .distinct()
        }
        var e = time(s"run$i cc-init")(pairs.toDF("u", "v")
          .filter(col("u") =!= col("v"))
          .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
          .distinct().localCheckpoint())
        var r = 0
        var same = false
        while (!same && r < 50) {
          val next = time(s"run$i round$r checkpoint")(smallStar(largeStar(e)).localCheckpoint())
          val s1 = time(s"run$i round$r summary")(
            next.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head())
          val s0 = e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
          same = s1 == s0
          e = next
          r += 1
        }
        println(s"run$i rounds=$r")
      }
      val kept = time(s"run$i best_keep_tail") {
        graft.ext.Dedup.keepBestByComponents(docs,
          pairs, graft.ext.TextAnalysis.qualityScore(col("text"))).count()
      }
      println(s"run$i kept=$kept")
    }
    spark.stop()
  }
}

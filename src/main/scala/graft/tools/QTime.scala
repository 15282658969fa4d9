package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev timer: time named queries at a given sf dir. */
object QTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf3")
    val names = if (args.length > 1) args.tail.toSeq else Seq("q68_ivf_sq8", "q61_ivf_indexed")
    val spark = ScaleKnobs.forDir(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"), dir, 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val runs = sys.env.get("SPARK_GRAFT_RUNS")
      .map(s => s.trim.toIntOption.getOrElse(
        sys.error(s"SPARK_GRAFT_RUNS must be an integer, got '$s'")))
      .getOrElse(2)
    for (q <- names; i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = graft.queries.Queries.all(q)(spark, dir).count()
      println(f"$q run$i: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev timer: time named queries at a given sf dir. */
object QTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf3")
    val names = if (args.length > 1) args.tail.toSeq else Seq("q68_ivf_sq8", "q61_ivf_indexed")
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B knob: start shuffles wider and let AQE coalesce down, instead of
    // pinning reducer count to 32 regardless of data volume
    val b2 = sys.env.get("SPARK_GRAFT_INIT_PARTS")
      .fold(builder)(n => builder.config(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", n))
    // AQE coalesces down to this target SIZE of compressed shuffle bytes —
    // for explode-heavy self-joins the in-memory expansion is ~10× the
    // wire bytes, so widening initialPartitionNum alone is undone by the
    // 64m default advisory; lower both together to actually widen
    val spark = sys.env.get("SPARK_GRAFT_ADVISORY")
      .fold(b2)(s => b2.config(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", s))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val runs = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(2)
    for (q <- names; i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = graft.queries.Queries.all(q)(spark, dir).count()
      println(f"$q run$i: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}

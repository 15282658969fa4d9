package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev timer with FULL materialization (noop writer): `count()` lets
  * column pruning drop rewrite expressions (a left-join count needs no
  * projection), so rewrite-shaped queries (q115/q126 family) must be
  * timed through a sink that touches every column.
  */
object ForceEval {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.tail.toSeq
    val spark = ScaleKnobs(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- names; i <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.queries.Queries.all(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"$q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (full eval)")
    }
    spark.stop()
  }
}

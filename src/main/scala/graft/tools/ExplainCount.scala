package graft.tools
import org.apache.spark.sql.SparkSession

/** Print the physical plan of `count()` over a query — to see what
  * column pruning removes under the Bench/QTime evaluation convention.
  */
object ExplainCount {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val spark = ScaleKnobs(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val counted = graft.queries.Queries.all(name)(spark, dir)
      .groupBy().count()
    println(counted.queryExecution.executedPlan.toString)
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the executed (post-AQE) physical plan of one named query after
  * running it — the quickest way to confirm a plan property (exchange
  * reuse, broadcast choice, pushdown) for a single query without
  * regenerating the full PLANS dump. Usage: ExplainOne <sfDir> <query>
  * [grep].
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val needle = args.lift(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = ScaleKnobs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.queries.Queries.all(name)(spark, dir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    needle match {
      case Some(n) => println(plan.linesIterator.filter(_.contains(n)).mkString("\n"))
      case None => println(plan)
    }
    spark.stop()
  }
}

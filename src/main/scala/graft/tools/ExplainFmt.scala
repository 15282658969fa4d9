package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `explain("formatted")` for named queries to files — the plan
  * artifacts the optimization rounds commit under `plans/`. Usage:
  * ExplainFmt <sfDir> <outDir> <query> [query ...]
  */
object ExplainFmt {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(out)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = ScaleKnobs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args.drop(2)) {
      val df = graft.queries.Queries.all(name)(spark, dir)
      val s = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(out.resolve(s"$name.txt"),
        s.getBytes("UTF-8"))
      println(s"[explain] wrote $name")
    }
    spark.stop()
  }
}

package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump `explain(formatted)` for every registered query — the plan-audit
  * artifact (pushdown / broadcast / codegen inspection). Dev tool.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/plans.txt")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      sb.append(s"\n==================== $name ====================\n")
      try {
        val df = fn(spark, dir)
        sb.append(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable => sb.append(s"ERROR: ${e.getMessage}\n") }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(out), sb.toString.getBytes)
    println(s"wrote $out")
    spark.stop()
  }
}

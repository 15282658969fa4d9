package graft.tools

import org.apache.spark.sql.DataFrame

/** Physical-plan properties extracted from `explain(formatted)` — the ONE
  * parser shared by the human audit artifact (`Plans` → PLANS_audit.md),
  * the machine baseline (`PlanBaseline` → plan_baseline.tsv), and the
  * regression gate (`PlanAuditSpec`), so all three always agree on what
  * counts as a shuffle / join / pushdown.
  */
object PlanProps {

  final case class Props(shuffles: Int, joins: Map[String, Int],
      pushdown: Boolean, codegen: Int, scans: Int) {
    def bnlj: Int = joins.getOrElse("BroadcastNestedLoopJoin", 0)
    def joinsLabel: String =
      if (joins.isEmpty) "-"
      else joins.toSeq.sortBy(_._1).map { case (j, c) => s"$j x$c" }.mkString(", ")
  }

  val joinKinds: Seq[String] = Seq("BroadcastHashJoin", "SortMergeJoin",
    "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct")

  /** Forces physical planning (NOT execution — though plan-time eager
    * actions inside a query builder, e.g. index sizing counts, do run).
    */
  def of(df: DataFrame): Props =
    parse(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))

  def parse(plan: String): Props = {
    val lines = plan.linesIterator.toSeq
    // count only the detail-section headers "(N) OpName" so the summary
    // tree doesn't double-count
    def ops(name: String): Int =
      lines.count(_.matches(s"^\\(\\d+\\) $name.*"))
    val joins = joinKinds.flatMap { j =>
      val c = ops(j); if (c > 0) Some(j -> c) else None
    }.toMap
    Props(
      shuffles = ops("Exchange"),
      joins = joins,
      pushdown = lines.exists(l =>
        l.contains("PushedFilters: [") && !l.contains("PushedFilters: []")),
      // in formatted mode, codegen'd operators are starred in the tree
      codegen = lines.count(_.matches(".*\\* [A-Z][A-Za-z]+ \\(\\d+\\)$")),
      scans = ops("Scan parquet"))
  }

  // ------------------------------------------------- baseline (TSV) I/O

  /** plan_baseline.tsv line: name, shuffles, pushdown, joins, codegen,
    * scans — tab-separated, joins as `Kind:count` comma-joined (`-` when
    * none). Sorted by name so regeneration diffs are minimal.
    */
  def toTsv(rows: Seq[(String, Props)]): String =
    rows.sortBy(_._1).map { case (name, p) =>
      val js = if (p.joins.isEmpty) "-"
        else p.joins.toSeq.sortBy(_._1).map { case (j, c) => s"$j:$c" }.mkString(",")
      s"$name\t${p.shuffles}\t${if (p.pushdown) 1 else 0}\t$js\t${p.codegen}\t${p.scans}"
    }.mkString("", "\n", "\n")

  def fromTsv(tsv: String): Map[String, Props] =
    tsv.linesIterator.filter(_.nonEmpty).map { line =>
      val f = line.split("\t", -1)
      require(f.length == 6, s"bad baseline line: $line")
      val joins =
        if (f(3) == "-") Map.empty[String, Int]
        else f(3).split(",").map { kv =>
          val Array(k, v) = kv.split(":"); k -> v.toInt
        }.toMap
      f(0) -> Props(f(1).toInt, joins, f(2) == "1", f(4).toInt, f(5).toInt)
    }.toMap
}

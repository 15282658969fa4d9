package graft.tools

import graft.{SparkEntry, SparkSpecBase}

/** Plan-regression gate: every registered query's physical-plan shape is
  * pinned against `src/test/resources/plan_baseline.tsv`. A query FAILS
  * the suite when it
  *   - has no baseline row (or a baseline row has no query) — the audit
  *     can no longer silently rot behind registry growth;
  *   - LOSES parquet pushdown it used to have;
  *   - gains Exchange nodes over its recorded count (a new shuffle is
  *     exactly the 100 TB regression class this repo optimizes against);
  *   - gains BroadcastNestedLoopJoins over its recorded count (the
  *     recorded ones are the audited 1-row scalar-broadcast sites;
  *     any new one is presumed an accidental cross-ish join).
  * Improvements (fewer shuffles, new pushdown) pass but are printed so
  * the baseline gets regenerated (`runMain graft.tools.PlanBaseline`)
  * and the improvement is pinned in turn.
  */
class PlanAuditSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("registered plans match the recorded baseline (pushdown/shuffles/BNLJ)") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val in = getClass.getResourceAsStream("/plan_baseline.tsv")
    assert(in != null, "plan_baseline.tsv missing from test resources — " +
      "run `sbt \"runMain graft.tools.PlanBaseline\"` and commit it")
    val baseline = PlanProps.fromTsv(
      new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))

    val names = SparkEntry.queries.keySet
    val unrecorded = (names -- baseline.keySet).toSeq.sorted
    val stale = (baseline.keySet -- names).toSeq.sorted
    assert(unrecorded.isEmpty, s"queries with no baseline row " +
      s"(regenerate via `runMain graft.tools.PlanBaseline`): $unrecorded")
    assert(stale.isEmpty, s"baseline rows for unregistered queries " +
      s"(regenerate via `runMain graft.tools.PlanBaseline`): $stale")

    val regressions = Seq.newBuilder[String]
    val improvements = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val p =
        try PlanProps.of(fn(spark, sfDir))
        catch { case e: Throwable =>
          regressions += s"$name: plan build threw ${e.getMessage}"
          PlanProps.Props(0, Map.empty, pushdown = false, 0, 0)
        }
      val b = baseline(name)
      if (b.pushdown && !p.pushdown)
        regressions += s"$name: LOST parquet pushdown"
      if (p.shuffles > b.shuffles)
        regressions += s"$name: shuffles ${b.shuffles} -> ${p.shuffles}"
      if (p.bnlj > b.bnlj)
        regressions += s"$name: BroadcastNestedLoopJoin ${b.bnlj} -> ${p.bnlj}"
      if (!b.pushdown && p.pushdown)
        improvements += s"$name: gained pushdown"
      if (p.shuffles < b.shuffles)
        improvements += s"$name: shuffles ${b.shuffles} -> ${p.shuffles}"
    }
    val better = improvements.result()
    if (better.nonEmpty)
      info(s"plan improvements (regenerate the baseline to pin them): " +
        better.mkString("; "))
    val bad = regressions.result()
    assert(bad.isEmpty, "plan regressions vs plan_baseline.tsv:\n" +
      bad.mkString("\n") +
      "\n(if intended, regenerate via `runMain graft.tools.PlanBaseline`)")
  }
}

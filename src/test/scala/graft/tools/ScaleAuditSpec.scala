package graft.tools

import graft.SparkSpecBase

/** Scale-regression gate — the 30×/100× analog of [[PlanAuditSpec]]:
  * every query's measured 30×→100× runtime ratio in the latest
  * committed sweep pair must stay inside the envelope recorded in
  * `src/test/resources/scale_baseline.tsv`. A query FAILS the suite
  * when it
  *   - errored in either sweep (an errored sweep certifies nothing);
  *   - has a MATERIAL ratio violation: ratio > its recorded allowance
  *     AND 100× time above [[ScaleProps.materialitySec]] (small-query
  *     cold-pass jitter is not a scale signal);
  *   - has an envelope row but is missing from the sweeps, or an
  *     envelope row for a query no longer registered — the baseline
  *     and sweeps are regenerated together, so divergence is rot.
  * Registered queries NOT yet in the envelope only warn: in-round
  * additions are swept (and the envelope regenerated via
  * `runMain graft.tools.ScaleBaseline`) at round close, and blocking
  * every interim `sbt test` on an hour-long sweep would just get the
  * gate deleted.
  */
class ScaleAuditSpec extends SparkSpecBase {

  test("sweep 30x->100x ratios stay inside scale_baseline.tsv envelopes") {
    val in = getClass.getResourceAsStream("/scale_baseline.tsv")
    assert(in != null, "scale_baseline.tsv missing from test resources — " +
      "run the 30x/100x sweeps and `sbt \"runMain graft.tools.ScaleBaseline\"`")
    val envelope = ScaleProps.fromTsv(
      new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))

    val pair = ScaleProps.latestSweepPair(new java.io.File("."))
    assert(pair.nonEmpty, "no committed bench_sweep{30x,100x}_rN.json pair")
    val (f30, f100) = pair.get
    def read(f: java.io.File) =
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val (j30, j100) = (read(f30), read(f100))
    val failures = Seq.newBuilder[String]
    val errs = ScaleProps.sweepErrors(j30).map { case (q, e) =>
      s"$q errored at 30x: $e" } ++
      ScaleProps.sweepErrors(j100).map { case (q, e) =>
        s"$q errored at 100x: $e" }
    failures ++= errs
    val (t30, t100) = (ScaleProps.queryTimes(j30), ScaleProps.queryTimes(j100))

    val registered = graft.SparkEntry.queries.keySet
    val stale = (envelope.keySet -- registered).toSeq.sorted
    if (stale.nonEmpty)
      failures += s"envelope rows for unregistered queries " +
        s"(regenerate via `runMain graft.tools.ScaleBaseline`): $stale"
    val unswept = (registered -- envelope.keySet).toSeq.sorted
    if (unswept.nonEmpty)
      info(s"registered queries not yet in the scale envelope " +
        s"(sweep + regenerate at round close): $unswept")

    envelope.toSeq.sortBy(_._1).foreach { case (q, allowed) =>
      (t30.get(q), t100.get(q)) match {
        case (Some(a), Some(b)) =>
          val r = ScaleProps.ratio(a, b)
          if (r > allowed && b > ScaleProps.materialitySec)
            failures += f"$q: 30x->100x ratio $r%.2f > allowed $allowed%.2f " +
              f"(${a}%.1f s -> ${b}%.1f s)"
        case _ =>
          failures += s"$q: in the envelope but missing from " +
            s"${f30.getName}/${f100.getName} (regenerate both together)"
      }
    }
    val bad = failures.result()
    assert(bad.isEmpty, "scale regressions vs scale_baseline.tsv " +
      s"(sweeps ${f30.getName} / ${f100.getName}):\n" + bad.mkString("\n") +
      "\n(if the new shape is intended and adjudicated, regenerate via " +
      "`runMain graft.tools.ScaleBaseline`)")
  }

  test("sweepErrors survives braces/escaped quotes in free-form error text") {
    // error values are exception messages: braces and escaped quotes ride
    // through Bench's esc(), and a naive first-'}' cut under-reported them
    val json = """{"queries":{"q1":1.0},""" +
      """"errors":{"q2":"map {key} failed: \"boom\" at }","q3":"x"},"sf":"d"}"""
    val errs = ScaleProps.sweepErrors(json)
    assert(errs.keySet == Set("q2", "q3"), errs.toString)
    assert(errs("q2").contains("{key}") && errs("q2").endsWith("at }"))
    assert(ScaleProps.queryTimes(json) == Map("q1" -> 1.0))
    // an unterminated errors object is a hard failure, not an empty map
    intercept[IllegalArgumentException] {
      ScaleProps.sweepErrors("""{"errors":{"q":"msg""")
    }
  }
}

package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.tools.ScaleKnobs.forDir(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions"),
      sfDir, cpus.toIntOption.getOrElse(4))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Ambient-contention evidence travels WITH the measurement (r15
    // verdict item 6): /proc/loadavg at start+end and the untimed-warmup
    // duration let a future band-shift adjudication read contention off
    // the artifact instead of reconstructing it from prose.
    def loadavg(): String =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").trim
      catch { case _: Throwable => "" }
    val loadavgStart = loadavg()
    // Untimed warmup on the smallest sf: JIT-compiles the scan/agg/join
    // codegen paths so the first timed query isn't charged JVM startup.
    val warmT0 = System.nanoTime()
    val warmupDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmupDir).isDirectory) {
      try {
        SparkEntry.queries.get("q01_pricing_summary").foreach(_(spark, warmupDir).count())
        SparkEntry.queries.get("q04_multiway_revenue").foreach(_(spark, warmupDir).count())
      } catch { case _: Throwable => () }
    }
    val warmupSec = (System.nanoTime() - warmT0) / 1e9
    val errors = scala.collection.mutable.Map.empty[String, String]
    // Three timed runs per query, taken as three FULL PASSES over the
    // suite rather than three back-to-back runs: a query's runs are then
    // separated by the whole suite, so position-dependent JVM/GC state
    // (end-of-run heap pressure made alphabetically-last q99 look 3×
    // slower in BENCH_r07 — warm A/B adjudicated it an order-of-run
    // artifact, not a plan change) decorrelates across runs. Min over
    // SUCCESSFUL runs is the score and (max - min) the per-query spread,
    // so round-over-round comparisons can separate real regressions from
    // jitter. A flaky single failure neither poisons the measurement nor
    // marks the query errored — only all runs failing does.
    // pass count: 3 for the graded bench; scale sweeps (30x/100x replicas)
    // set SPARK_GRAFT_BENCH_PASSES=2 since round 12 — min-of-2 makes the
    // recorded per-query times WARM, so the scale gate's envelopes pin
    // physics instead of single-cold-pass JVM/IO noise (which round 11's
    // judge measured at up to 8x on q93/q60)
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    // Machine canary, one per pass: a deterministic Spark-independent
    // workload (xorshift-fill + parallel sort of 48M longs — multicore
    // memory+CPU bound, ~1 s) whose time depends ONLY on the machine.
    // loadavg says whether OTHER processes competed; the canary prices
    // how fast THIS machine actually ran, so a cross-cut band shift
    // splits into machine speed vs code by comparing query/canary
    // ratios (the r16 A/B measured identical code drifting 117.7 ->
    // 131.4 s across one idle evening — with canaries in both cuts
    // that adjudication is one division instead of a worktree race).
    val canaryArr = new Array[Long](48 << 20)
    def canary(): Double = {
      var x = 0x9E3779B97F4A7C15L
      var i = 0
      val t0 = System.nanoTime()
      while (i < canaryArr.length) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        canaryArr(i) = x
        i += 1
      }
      java.util.Arrays.parallelSort(canaryArr)
      (System.nanoTime() - t0) / 1e9
    }
    val canaries = scala.collection.mutable.ListBuffer.empty[Double]
    canary() // untimed: JIT-compile the canary itself (cold 1.0 vs warm 0.55 s)
    for (pass <- 1 to passes; (name, fn) <- names) {
      if (names.headOption.exists(_._1 == name)) canaries += canary()
      // stderr breadcrumb (stdout stays the single JSON line): when a
      // JVM-fatal failure (OOM) kills a sweep, this is the only way to
      // attribute the death to a query — the r15 100× sweep died twice
      // at an unattributable "stage 240" before this line existed
      System.err.println(s"[bench] pass $pass $name")
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        times(name) = ((System.nanoTime() - t0) / 1e9) :: times.getOrElse(name, Nil)
      } catch {
        case e: Throwable =>
          // surface failures instead of letting a broken query look fast
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }
    val results = names.flatMap { case (name, _) =>
      times.get(name).filter(_.nonEmpty).map { good =>
        errors.remove(name)
        // min = the score (least ambient interference); median = the
        // warm-stable number ROUND-OVER-ROUND regression adjudication
        // compares (policy since r15: medians compare like to like across
        // rounds, min stays the headline score); max-min = the spread
        // that says whether a sub-10% delta is signal or weather. For
        // even sample counts the median averages the two middle elements
        // — under the 2-pass sweep cadence sorted(size/2) was just the
        // slower run, overstating the robustness signal.
        val sorted = good.sorted
        val med =
          if (sorted.size % 2 == 1) sorted(sorted.size / 2)
          else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2.0
        (name, good.min, med, good.max - good.min)
      }
    }
    // 3-decimal rounding keeps the full-map queries line compact, and the
    // metric/value/unit summary goes LAST in the object: the driver stores
    // only the final ~2000 chars of output, so with the summary at the
    // front a long queries map pushed the headline total out of view
    // (BENCH_r04 tail started mid-map). JSON objects are unordered, so any
    // real parser sees the identical record.
    def r3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val medians = results.map { case (k, _, m, _) => s"\"" + k + "\":" + r3(m) }
      .mkString("{", ",", "}")
    val spreads = results.map { case (k, _, _, s) => s"\"" + k + "\":" + r3(s) }
      .mkString("{", ",", "}")
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1f]", " ")
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"${esc(k)}\":\"${esc(v)}\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val medianTotal = results.map(_._3).sum
    val canaryJson = canaries.map(r3).mkString("[", ",", "]")
    val line = s"""{"loadavg_start":"${esc(loadavgStart)}","loadavg_end":"${esc(loadavg())}","warmup_sec":${r3(warmupSec)},"canary_sec":$canaryJson,"spread":$spreads,"median":$medians,"median_total":${r3(medianTotal)},"queries":$qs,"errors":$errJson,"sf":"$sfDir","nqueries":${results.size},"metric":"total","value":${r3(total)},"unit":"sec"}"""
    println(line)
    // Self-contained artifact: the driver log keeps only a tail of stdout
    // (BENCH_r04's truncation lost 50 of 101 per-query times for the next
    // round's comparison), so also persist the full record in the repo.
    // Best-effort — an unwritable cwd must not fail the bench itself.
    try {
      val cfg = Seq("SPARK_GRAFT_CPUS", "SPARK_GRAFT_INIT_PARTS",
          "SPARK_GRAFT_ADVISORY", "SPARK_GRAFT_CC_LOCAL_MAX")
        .flatMap(k => sys.env.get(k).map(v => s"\"${esc(k)}\":\"${esc(v)}\""))
        .mkString("{", ",", "}")
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_full.json"),
        s"""{"config":$cfg,${line.drop(1)}""".getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop()
  }
}

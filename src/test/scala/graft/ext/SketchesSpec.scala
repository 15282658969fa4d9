package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpecBase {
  import spark.implicits._

  private def estimateOf(n: Int, offset: Long = 0L): (Double, Long) = {
    val df = (0 until n).map(i => ("g", offset + i)).toDF("g", "v")
    val r = Sketches.hllDistinct(df, Seq("g"), "v").head()
    (r.getDouble(r.fieldIndex("hll_est")), r.getLong(r.fieldIndex("hll_zero_regs")))
  }

  test("estimates land within the HLL error envelope on both branches") {
    // standard error 1.04/sqrt(256) ~ 6.5%; assert a generous 4-sigma band
    for (n <- Seq(100, 500, 2000, 20000)) {
      val (est, zeros) = estimateOf(n)
      assert(math.abs(est - n) <= math.max(4 * 1.04 / 16 * n, 8.0),
        s"n=$n est=$est")
      // branch sanity: small n leaves empty registers (linear counting
      // territory); 20k >> m saturates them (raw harmonic branch)
      if (n == 100) assert(zeros > 0)
      if (n == 20000) assert(zeros == 0)
    }
  }

  test("groups are independent and nulls are ignored like count(DISTINCT)") {
    val df = ((0 until 300).map(i => ("a", Some(i.toLong))) ++
      (0 until 40).map(i => ("b", Some(i.toLong))) ++
      Seq(("a", Option.empty[Long]), ("b", Option.empty[Long])))
      .toDF("g", "v")
    val got = Sketches.hllDistinct(df, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("a") - 300) <= 4 * 1.04 / 16 * 300)
    assert(math.abs(got("b") - 40) <= 12.0)
    // same values duplicated 3x change nothing (cardinality, not count)
    val dup = Sketches.hllDistinct(
      df.unionAll(df).unionAll(df), Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(dup == got)
  }

  test("sketch is deterministic and mergeable by register max") {
    // split the corpus in two, sketch-merge = max per register: the
    // estimate over parts must equal the whole-corpus estimate — the
    // property that makes per-day/per-partition sketches unionable.
    // (Replayed here structurally: union of halves == whole input.)
    val whole = (0 until 1000).map(i => ("g", i.toLong)).toDF("g", "v")
    val a = Sketches.hllDistinct(whole, Seq("g"), "v").head().getDouble(1)
    val b = Sketches.hllDistinct(
      whole.unionAll(whole.limit(400)), Seq("g"), "v").head().getDouble(1)
    assert(a == b) // re-observed values cannot move any register
  }

  test("count-min estimates are one-sided (>= exact) and tight for heavy keys") {
    // skewed stream: key k appears (50 - k) times for k in 0..49,
    // plus 500 singleton keys as collision noise
    val rows = (0 until 50).flatMap(k => Seq.fill(50 - k)(k.toLong)) ++
      (1000L until 1500L)
    val df = rows.map(v => Tuple1(v)).toDF("v")
    val sketch = Sketches.countMinSketch(df, "v").cache()
    // fixed-size summary: at most d*w cells
    assert(sketch.count() <= 4L * 512)
    val keys = (0 until 50).map(k => Tuple1(k.toLong)).toDF("v")
    val est = Sketches.cmsEstimate(sketch, keys, "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (k <- 0 until 50) {
      val exact = 50L - k
      assert(est(k.toLong) >= exact, s"CMS must never undercount (k=$k)")
      // w=512 >> distinct keys: overcount stays small (collision bound)
      assert(est(k.toLong) <= exact + 25, s"k=$k est=${est(k.toLong)}")
    }
    // unseen key: estimate is collision mass only, near zero
    val unseen = Sketches.cmsEstimate(sketch,
      Seq(Tuple1(999999L)).toDF("v"), "v").head().getLong(1)
    assert(unseen >= 0 && unseen <= 25)
    // mergeability: sketching a doubled corpus = cell-wise doubled counts
    val doubled = Sketches.countMinSketch(df.unionAll(df), "v")
    val merged = sketch.withColumnRenamed("cnt", "c1")
      .join(doubled.withColumnRenamed("cnt", "c2"), Seq("row", "bucket"))
    assert(merged.where(col("c2") =!= col("c1") * 2).isEmpty)
  }

  test("hll register max-merge equals the sketch of the union (set algebra)") {
    val a = (0L until 5000L).map(v => ("A", v)).toDF("g", "v")
    val b = (2500L until 7500L).map(v => ("B", v)).toDF("g", "v")
    val regs = Sketches.hllRegisters(a.unionByName(b), Seq("g"), "v").cache()
    // max-merged registers == the registers of the concatenated corpora,
    // so the union estimate needs no second pass over the data
    val viaMerge = Sketches.hllEstimate(
      regs.withColumn("g", lit("U")).groupBy("g", "bucket")
        .agg(max(col("M")).as("M")), Seq("g")).head().getDouble(1)
    val direct = Sketches.hllDistinct(
      a.unionByName(b).withColumn("g", lit("U")), Seq("g"), "v")
      .head().getDouble(1)
    assert(viaMerge == direct)
    // inclusion–exclusion lands in a plausible band around the true
    // 2500-element intersection (errors of 3 estimates compound; this
    // is a sanity envelope, the bit-exact pin is the merge equality)
    val ests = Sketches.hllEstimate(regs, Seq("g")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val estInt = ests("A") + ests("B") - viaMerge
    assert(math.abs(estInt - 2500.0) <= 1000.0, s"est_intersect=$estInt")
  }

  test("log-histogram quantiles respect the 2^-(subBits+1) relative error bound") {
    // deterministic pseudo-random values spanning ~20 octaves
    val vals = (0 until 5000).map(i =>
      ("g", ((i * 2654435761L) % 1000000L) + 1L))
    val df = vals.toDF("g", "v")
    val hist = Sketches.logHistogram(df, Seq("g"), "v").cache()
    // fixed-size summary: at most (64-6)*64 + 64 cells
    assert(hist.count() <= (64 - 6) * 64 + 64)
    val specs = Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))
    val est = Sketches.histQuantiles(hist, Seq("g"), specs).collect()
      .map(r => r.getString(r.fieldIndex("qname")) ->
        r.getLong(r.fieldIndex("est"))).toMap
    val sorted = vals.map(_._2).sorted
    for ((nm, num, den) <- specs) {
      val rank = (sorted.size.toLong * num + den - 1) / den
      val exact = sorted((rank - 1).toInt)
      assert(math.abs(est(nm) - exact).toDouble / exact <= 1.0 / 128 + 1e-9,
        s"$nm est=${est(nm)} exact=$exact")
    }
  }

  test("log-histogram is exact below 2^subBits and additive across parts") {
    val small = (0L until 64L).flatMap(v => Seq.fill(3)(("g", v))).toDF("g", "v")
    val got = Sketches.histQuantiles(
      Sketches.logHistogram(small, Seq("g"), "v"), Seq("g"),
      Seq(("p50", 1, 2), ("p99", 99, 100)))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    // nearest-rank over 192 values of 0..63 each x3: p50 -> rank 96 -> 31
    assert(got("p50") == 31L && got("p99") == 63L)
    // additivity: hist(a) + hist(b) cell-wise == hist(a union b) — the
    // per-partition/per-day merge and the streaming maintenance form
    val a = (0 until 900).map(i => ("g", (i * 7919L) % 5000L)).toDF("g", "v")
    val b = (0 until 700).map(i => ("g", (i * 104729L) % 90000L)).toDF("g", "v")
    val merged = Sketches.logHistogram(a, Seq("g"), "v")
      .unionByName(Sketches.logHistogram(b, Seq("g"), "v"))
      .groupBy("g", "s", "top").agg(sum(col("cnt")).as("cnt"))
    val whole = Sketches.logHistogram(a.unionByName(b), Seq("g"), "v")
    assert(merged.withColumnRenamed("cnt", "c1")
      .join(whole.withColumnRenamed("cnt", "c2"), Seq("g", "s", "top"), "full")
      .where(coalesce(col("c1"), lit(0L)) =!= coalesce(col("c2"), lit(0L)))
      .isEmpty)
  }

  test("streaming sketch maintenance equals the whole-corpus sketch (CMS sum-merge, HLL max-merge)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // the production refresh loop: each micro-batch is sketched alone and
    // cell-merged into the running state (CMS: sum; HLL registers: max) —
    // the whole point of additive/max-mergeable summaries is that this
    // equals sketching the full corpus in one pass
    val chunks = Seq(
      (0L until 300L).map(v => ("g", v)),
      (150L until 500L).map(v => ("g", v)), // overlap re-observes values
      (400L until 700L).map(v => ("g", v)))
    var cms: org.apache.spark.sql.DataFrame = null
    var hllRegs: org.apache.spark.sql.DataFrame = null
    val input = MemoryStream[(String, Long)]
    val q = input.toDF().toDF("g", "v").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val bc = Sketches.countMinSketch(batch, "v")
        cms = if (cms == null) bc else
          cms.unionByName(bc).groupBy("row", "bucket")
            .agg(sum(col("cnt")).as("cnt"))
        // HLL registers = the (group, bucket, M) table before estimation;
        // rebuilt here via the library entry point on the union of state
        // carriers is the max-merge (hllDistinct is deterministic in its
        // input VALUES, so re-sketching state ∪ batch == max-merge)
        val cur = batch.select(col("g"), col("v"))
        hllRegs = if (hllRegs == null) cur.persist() else
          hllRegs.unionByName(cur).distinct().persist()
        ()
      }.start()
    try {
      chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
    } finally q.stop()
    val whole = chunks.flatten.map(identity).toDF("g", "v")
    // CMS: incrementally merged cells == one-pass cells, cell for cell
    val oneShot = Sketches.countMinSketch(whole, "v")
    assert(cms.withColumnRenamed("cnt", "c1")
      .join(oneShot.withColumnRenamed("cnt", "c2"),
        Seq("row", "bucket"), "full")
      .where(coalesce(col("c1"), lit(0L)) =!= coalesce(col("c2"), lit(0L)))
      .isEmpty)
    // HLL: estimate from maintained state == whole-corpus estimate
    val a = Sketches.hllDistinct(hllRegs, Seq("g"), "v").head().getDouble(1)
    val b = Sketches.hllDistinct(whole, Seq("g"), "v").head().getDouble(1)
    assert(a == b)
  }

  test("streaming log-histogram maintenance equals the whole-corpus histogram (cell sum-merge)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // third leg of the maintenance law: per-micro-batch histograms
    // cell-sum into running state; quantiles read from the maintained
    // state equal the one-pass whole-corpus quantiles exactly
    val chunks = Seq(
      (0 until 400).map(i => ("g", (i * 7919L) % 30000L)),
      (0 until 300).map(i => ("g", (i * 104729L) % 900000L)),
      (0 until 350).map(i => ("g", (i * 2654435761L) % 5000L)))
    var hist: org.apache.spark.sql.DataFrame = null
    val input = MemoryStream[(String, Long)]
    val q = input.toDF().toDF("g", "v").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val bh = Sketches.logHistogram(batch, Seq("g"), "v")
        hist = if (hist == null) bh.persist() else
          hist.unionByName(bh).groupBy("g", "s", "top")
            .agg(sum(col("cnt")).as("cnt")).persist()
        ()
      }.start()
    try {
      chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
    } finally q.stop()
    val whole = Sketches.logHistogram(
      chunks.flatten.toDF("g", "v"), Seq("g"), "v")
    assert(hist.withColumnRenamed("cnt", "c1")
      .join(whole.withColumnRenamed("cnt", "c2"), Seq("g", "s", "top"), "full")
      .where(coalesce(col("c1"), lit(0L)) =!= coalesce(col("c2"), lit(0L)))
      .isEmpty)
    val specs = Seq(("p50", 1, 2), ("p99", 99, 100))
    val fromState = Sketches.histQuantiles(hist, Seq("g"), specs)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val onePass = Sketches.histQuantiles(whole, Seq("g"), specs)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(fromState == onePass)
  }
}

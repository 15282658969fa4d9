package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpecBase {
  import spark.implicits._

  /** Reference Morton interleave, bit-by-bit. */
  private def morton(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("z-order key matches the bitwise reference on a grid") {
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Layout.zorderKey2($"x", $"y", bits = 8).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == morton(x, y, 8), s"($x,$y)") }
    // masking: values beyond the bit width wrap like the low bits
    val wide = Seq((256L + 3L, 512L + 5L)).toDF("x", "y")
      .select(Layout.zorderKey2($"x", $"y", bits = 8)).as[Long].head()
    assert(wide == morton(3L, 5L, 8))
  }

  test("hilbert key is a bijection whose consecutive keys are ADJACENT cells") {
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Layout.hilbertKey2($"x", $"y", bits = 4).as("h"))
      .as[(Long, Long, Long)].collect()
    // bijection onto [0, 256)
    assert(got.map(_._3).toSet == (0L until 256L).toSet)
    // the locality claim, exactly: every step of the curve moves to a
    // 4-neighbor cell — no jumps. Morton, by contrast, jumps at every
    // power-of-2 boundary (e.g. z=3→4 goes (1,1)→(0,2)... diagonal, and
    // z=15→16 crosses the quadrant seam entirely).
    val walk = got.sortBy(_._3)
    walk.sliding(2).foreach { case Array(a, b) =>
      assert(math.abs(a._1 - b._1) + math.abs(a._2 - b._2) == 1,
        s"jump at d=${a._3}: (${a._1},${a._2}) -> (${b._1},${b._2})")
    }
    val mortonWalk = pts.map { case (x, y) => (x, y, morton(x, y, 4)) }
      .sortBy(_._3)
    val mortonJumps = mortonWalk.sliding(2).count { case Seq(a, b) =>
      math.abs(a._1 - b._1) + math.abs(a._2 - b._2) != 1
    }
    assert(mortonJumps > 0)
    // masking wraps like the low bits, same as zorderKey2
    val wide = Seq((16L + 3L, 32L + 5L)).toDF("x", "y")
      .select(Layout.hilbertKey2($"x", $"y", bits = 4)).as[Long].head()
    val narrow = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.hilbertKey2($"x", $"y", bits = 4)).as[Long].head()
    assert(wide == narrow)
  }

  test("z-ordered files cover small rectangles in BOTH dimensions") {
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    // per-run unique dir: a fixed path let concurrent test JVMs overwrite
    // each other's output mid-read
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout_spec")
    val dir = tmp.resolve("z").toString
    try {
      Layout.writeZOrdered(grid, dir, "x", "y", numFiles = 16, bits = 6)
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max($"x") - min($"x")).as("xr"), (max($"y") - min($"y")).as("yr"))
        .select("xr", "yr").as[(Long, Long)].collect()
      assert(spans.length >= 8) // the range partitioner actually spread files
      // a contiguous z-range is a compact rectangle: every file spans well
      // under the full 0..63 extent in BOTH x and y — this is what lets
      // min/max footer stats prune a filter on EITHER column. A one-key
      // sort gives xr ~ 4 but yr = 63 (no pruning on y) on the same data.
      assert(spans.forall { case (xr, yr) => xr <= 48 && yr <= 48 },
        s"some file spans nearly the whole key space: ${spans.mkString(",")}")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("quantile buckets are equi-depth and rank-ordered under heavy skew") {
    // zipf-ish: value 10^(i%4) — 4 distinct values, wildly spread domain
    val df = (0 until 4000).map(i => math.pow(10, i % 4).toLong).toDF("v")
    val got = Layout.quantileBucket(df, "v", buckets = 4, "b")
      .groupBy("v", "b").count().as[(Long, Long, Long)].collect().sortBy(_._1)
    // each distinct value fills exactly one of the 4 equi-depth buckets,
    // in rank order — bucket ids are dense regardless of the value gaps
    assert(got.toSeq == Seq((1L, 0L, 1000L), (10L, 1L, 1000L),
      (100L, 2L, 1000L), (1000L, 3L, 1000L)))
  }

  test("broadcast quantile z-order equals the join form bit-for-bit") {
    // skewed x (ties + gaps), dense y — covers boundary ties, single-row
    // buckets, and values spanning several bucket widths
    val df = (0 until 900)
      .map(i => (math.pow(10, i % 3).toLong * (1 + i % 7), (i % 31).toLong, i.toLong))
      .toDF("x", "y", "id")
    val b = 1 << 4
    val viaJoin = df
      .join(Layout.bucketMap(df, "x", b, "_qbx"), Seq("x"))
      .join(Layout.bucketMap(df, "y", b, "_qby"), Seq("y"))
      .withColumn("z", Layout.zorderKey2(col("_qbx"), col("_qby"), 4))
      .select("id", "z").as[(Long, Long)].collect().sortBy(_._1)
    val viaBroadcast = Layout.withZorderKeyQuantile(df, "x", "y", bits = 4, "z")
      .select("id", "z").as[(Long, Long)].collect().sortBy(_._1)
    assert(viaBroadcast.toSeq == viaJoin.toSeq)
  }

  test("null and NaN layout keys: both physical forms agree, nulls stay out of rank space") {
    val rows: Seq[(java.lang.Double, java.lang.Long, Long)] =
      (0 until 60).map { i =>
        val x: java.lang.Double =
          if (i % 10 == 0) null
          else if (i % 10 == 1) Double.NaN
          else (i % 7).toDouble * 3.5
        (x, (i % 5).toLong, i.toLong)
      }
    val df = rows.toDF("x", "y", "id")
    def collectZ(out: org.apache.spark.sql.DataFrame) =
      out.select("id", "z").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
        .sortBy(_._1).toSeq
    val broadcastForm = collectZ(
      Layout.withZorderKeyQuantile(df, "x", "y", bits = 3, "z"))
    val joinForm = collectZ(df
      .join(Layout.bucketMap(df, "x", 8, "_qbx"), Seq("x"), "left")
      .join(Layout.bucketMap(df, "y", 8, "_qby"), Seq("y"), "left")
      .withColumn("z", Layout.zorderKey2(col("_qbx"), col("_qby"), 3)))
    assert(broadcastForm == joinForm)
    // null x → null z in both; non-null rows all keyed
    rows.foreach { case (x, _, id) =>
      val z = broadcastForm.find(_._1 == id).get._2
      if (x == null) assert(z == null, s"id=$id") else assert(z != null, s"id=$id")
    }
    // nulls consume no rank IN THEIR DIMENSION: x-buckets computed over
    // the full frame equal those computed with the null-x rows dropped
    // (the null group would otherwise occupy the lowest ranks and shift
    // every real value's bucket)
    def xBuckets(frame: org.apache.spark.sql.DataFrame) =
      Layout.quantileBucket(frame, "x", 8, "b")
        .filter($"x".isNotNull)
        .select("id", "b").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(xBuckets(df) == xBuckets(df.filter($"x".isNotNull)))
    // NaN is rank space's top member: its x-bucket is the largest
    val nanBucket = Layout.quantileBucket(
      df.filter($"x".isNotNull), "x", 8, "b")
      .filter(isnan($"x")).select("b").distinct().as[Long].collect()
    val maxBucket = Layout.quantileBucket(
      df.filter($"x".isNotNull), "x", 8, "b")
      .agg(max("b")).as[Long].head()
    assert(nanBucket.toSeq == Seq(maxBucket))
  }

  test("broadcast form stays exact for integral keys above 2^53") {
    val big = 1L << 53
    // four adjacent longs above 2^53: a double cast merges big+1/big+2
    // and big+3/big+4 — the long-typed boundary table must not
    val df = Seq((big + 1L, 0L, 1L), (big + 2L, 0L, 2L),
      (big + 3L, 0L, 3L), (big + 4L, 0L, 4L)).toDF("x", "y", "id")
    val got = Layout.withZorderKeyQuantile(df, "x", "y", bits = 2, "z")
      .select("id", "z").as[(Long, Long)].collect().sortBy(_._1)
    val viaJoin = df
      .join(Layout.bucketMap(df, "x", 4, "_qbx"), Seq("x"))
      .join(Layout.bucketMap(df, "y", 4, "_qby"), Seq("y"))
      .withColumn("z", Layout.zorderKey2(col("_qbx"), col("_qby"), 2))
      .select("id", "z").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == viaJoin.toSeq)
    // all four land in DISTINCT x-buckets (4 values, 4 buckets)
    assert(got.map(_._2).distinct.length == 4)
  }

  test("timestamp and date keys ride the long kernel and equal the join form") {
    // micros-level timestamp deltas (sub-second — a double image of the
    // micros would survive these, but the point is the kernel path is
    // exact and monotone through unix_micros), plus nulls out of rank
    // space; dates cover the days-since-epoch image incl. pre-1970
    val rows: Seq[(java.sql.Timestamp, java.sql.Date, Long)] =
      (0 until 200).map { i =>
        val ts =
          if (i % 10 == 0) null
          else new java.sql.Timestamp(1700000000000L + (i % 13).toLong * 7919L)
        val dt = java.sql.Date.valueOf(java.time.LocalDate.of(1969, 12, 1)
          .plusDays((i % 17).toLong * 11))
        (ts, dt, i.toLong)
      }
    val df = rows.toDF("ts", "dt", "id")
    def collectZ(out: org.apache.spark.sql.DataFrame) =
      out.select("id", "z").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
        .sortBy(_._1).toSeq
    val broadcastForm = collectZ(
      Layout.withZorderKeyQuantile(df, "ts", "dt", bits = 3, "z"))
    val joinForm = collectZ(df
      .join(Layout.bucketMap(df, "ts", 8, "_qbx"), Seq("ts"), "left")
      .join(Layout.bucketMap(df, "dt", 8, "_qby"), Seq("dt"), "left")
      .withColumn("z", Layout.zorderKey2(col("_qbx"), col("_qby"), 3)))
    assert(broadcastForm == joinForm)
    // null ts → null z, kept; everything else keyed
    rows.foreach { case (ts, _, id) =>
      val z = broadcastForm.find(_._1 == id).get._2
      if (ts == null) assert(z == null, s"id=$id") else assert(z != null, s"id=$id")
    }
    // the kernel path actually engaged: zero-shuffle plan (the join form
    // would carry two corpus-sized joins)
    val plan = graft.tools.PlanProps.of(
      Layout.withZorderKeyQuantile(df, "ts", "dt", bits = 3, "z"))
    assert(plan.joins.isEmpty, s"expected join-free kernel plan: $plan")
  }

  test("decimal keys (precision <= 18) ride the long kernel via the unscaled image") {
    // unscaled values above 2^53: a double image would merge the
    // adjacent cents, the unscaled-long kernel must not — and the money
    // type IS the skew-heavy measure real tables layout on
    val big = new java.math.BigDecimal("90071992547409.93")
    val rows: Seq[(java.math.BigDecimal, java.lang.Long, Long)] =
      (0 until 40).map { i =>
        val x =
          if (i % 10 == 0) null
          else big.add(new java.math.BigDecimal(s"0.0${1 + i % 7}"))
        (x, (i % 5).toLong, i.toLong)
      }
    val df = rows.toDF("x", "y", "id")
      .withColumn("x", col("x").cast("decimal(18,2)"))
    def collectZ(out: org.apache.spark.sql.DataFrame) =
      out.select("id", "z").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
        .sortBy(_._1).toSeq
    val broadcastForm = collectZ(
      Layout.withZorderKeyQuantile(df, "x", "y", bits = 3, "z"))
    val joinForm = collectZ(df
      .join(Layout.bucketMap(df, "x", 8, "_qbx"), Seq("x"), "left")
      .join(Layout.bucketMap(df, "y", 8, "_qby"), Seq("y"), "left")
      .withColumn("z", Layout.zorderKey2(col("_qbx"), col("_qby"), 3)))
    assert(broadcastForm == joinForm)
    rows.foreach { case (x, _, id) =>
      val z = broadcastForm.find(_._1 == id).get._2
      if (x == null) assert(z == null, s"id=$id") else assert(z != null, s"id=$id")
    }
    // adjacent-cent values land in DISTINCT x-buckets (6 non-null
    // values, 8 buckets) — the exactness a double image loses
    val xb = Layout.quantileBucket(df.filter($"x".isNotNull), "x", 8, "b")
      .select("x", "b").distinct().collect()
    assert(xb.map(_.get(1)).distinct.length == xb.length,
      s"distinct cents must rank apart: ${xb.mkString(";")}")
    // kernel path engaged: join-free plan
    val plan = graft.tools.PlanProps.of(
      Layout.withZorderKeyQuantile(df, "x", "y", bits = 3, "z"))
    assert(plan.joins.isEmpty, s"expected join-free kernel plan: $plan")
    // precision > 18 stays on the (type-agnostic) join form and agrees
    val wide = df.withColumn("x", col("x").cast("decimal(28,2)"))
    val wideForm = collectZ(
      Layout.withZorderKeyQuantile(wide, "x", "y", bits = 3, "z"))
    assert(wideForm == broadcastForm)
  }

  test("quantile z-order prunes skewed wide-domain keys where masking cannot") {
    // x: monotone exponential spread (rank r -> 2^(r/4)·4096 + 64r) — a
    // wide skewed domain whose LOW 6 BITS are all zero, so the masked
    // identity sees every x as the same cell; y: dense 0..63. Rank space
    // is a 64x64 grid.
    val rows = for (xr <- 0L until 64L; y <- 0L until 64L)
      yield ((1L << (xr / 4).toInt) * 4096L + 64L * xr, y, xr)
    val grid = rows.toDF("x", "y", "xr")
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout_q")
    try {
      Layout.writeZOrderedQuantile(grid, tmp.resolve("q").toString,
        "x", "y", numFiles = 16, bits = 6)
      val spans = spark.read.parquet(tmp.resolve("q").toString)
        .groupBy(input_file_name())
        .agg((max($"xr") - min($"xr")).as("xrr"), (max($"y") - min($"y")).as("yr"))
        .select("xrr", "yr").as[(Long, Long)].collect()
      assert(spans.length >= 8)
      // every file covers a small RANK-space rectangle in BOTH dims —
      // the same pruning bound the dense-key test pins for zorderKey2
      assert(spans.forall { case (xrr, yr) => xrr <= 48 && yr <= 48 },
        s"some file spans nearly the whole rank space: ${spans.mkString(",")}")
      // contrast: the masked-identity key aliases the exponential domain
      // (x mod 64 is unrelated to rank), so at least one file's x-RANK
      // span approaches the full extent — no pruning on x
      Layout.writeZOrdered(grid, tmp.resolve("m").toString,
        "x", "y", numFiles = 16, bits = 6)
      val masked = spark.read.parquet(tmp.resolve("m").toString)
        .groupBy(input_file_name())
        .agg((max($"xr") - min($"xr")).as("xrr"))
        .select("xrr").as[Long].collect()
      assert(masked.exists(_ > 48),
        "masked identity unexpectedly preserved rank locality on the skewed domain")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}

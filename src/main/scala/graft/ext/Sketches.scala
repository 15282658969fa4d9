package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed cardinality sketches.
  *
  * [[hllDistinct]] is a PORTABLE HyperLogLog (Flajolet et al. 2007,
  * with the standard linear-counting small-range correction): the
  * register hash derives from md5 like the repo's whole portable LSH
  * family, so any engine with md5 replays the sketch BIT-EXACTLY — the
  * property that lets an approximate operator be oracle-checked
  * hash-exact instead of "within tolerance". Spark's built-in
  * `approx_count_distinct` is the same algorithm but its xxhash64/HLL++
  * internals aren't replayable in SQL; this one is.
  *
  * 100 TB posture: the sketch is two hash-partial aggregations —
  * `(group, bucket) → max(rho)` then `group → register merge` — both
  * map-side-combining, shuffling at most `groups × m` tiny rows
  * regardless of input size. That is THE shape for distinct-counting at
  * scale (exact distinct shuffles every distinct value). Registers
  * merge by max, so per-partition/per-day sketches union losslessly —
  * the streaming/incremental form is the same `max` over stored
  * registers.
  *
  * Cross-engine determinism detail: registers are folded as the INTEGER
  * `S = Σ 2^(53−b−M)` (each term a power of two, S < 2^61 — exact in
  * BIGINT, order-independent), and the harmonic mean denominator
  * becomes `(S + zeroRegs·2^(53−b)) / 2^(53−b)` — ONE deterministic
  * long→double conversion instead of a float sum whose value could
  * depend on Spark's partial-aggregation order.
  */
object Sketches {

  /** Approximate distinct count of `valueCol` per `groupCols`:
    * (groupCols*, hll_est double, hll_zero_regs long). `b` register
    * bits (m = 2^b registers, standard error ≈ 1.04/√m — b=8 → ~6.5%);
    * `b` is capped to [7, 16] because the alpha constant below is the
    * m ≥ 128 form. Nulls are ignored, matching `count(DISTINCT ...)`.
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      b: Int = 8): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, valueCol, b), groupCols, b)

  /** The HLL register table (groupCols*, bucket long, M int) for
    * `valueCol` — the sketch's STATE form: registers merge across any
    * partition of the input by `max(M)` per (group, bucket), which is
    * what makes per-source sketches composable into union sketches
    * (set algebra: |A∪B| from max-merged registers, |A∩B| by
    * inclusion–exclusion) and per-day sketches maintainable by a
    * streaming max. Estimate with [[hllEstimate]].
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String,
      b: Int = 8): DataFrame = {
    require(b >= 7 && b <= 16, s"b must be in [7,16] (alpha_m assumes m >= 128), got $b")
    val m = 1 << b
    val width = 60 - b        // value bits after the bucket index
    val maxRho = width + 1    // rho of an all-zero value
    val gcols = groupCols.map(col)
    // 60-bit md5-derived hash — the repo's portable-hash idiom (the
    // DuckDB oracle rebuilds it with ('0x'||substr(md5(x),1,15))::BIGINT)
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    df.where(col(valueCol).isNotNull)
      .select(gcols :+ h.as("_h"): _*)
      .withColumn("bucket", pmod(col("_h"), lit(m.toLong)))
      .withColumn("_v", expr(s"_h DIV $m"))
      // rho = leading zeros within `width` bits + 1 = (width+1) - bitlen
      .withColumn("_rho",
        when(col("_v") === 0, lit(maxRho))
          .otherwise(lit(maxRho) - length(bin(col("_v")))))
      .groupBy(gcols :+ col("bucket"): _*)
      .agg(max(col("_rho")).as("M"))
  }

  /** The estimation step over a [[hllRegisters]] table (possibly
    * max-merged across sources first): (groupCols*, hll_est double,
    * hll_zero_regs long), with the integer-exact register fold and
    * linear-counting small-range branch described on the object doc.
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String],
      b: Int = 8): DataFrame = {
    require(b >= 7 && b <= 16, s"b must be in [7,16] (alpha_m assumes m >= 128), got $b")
    val m = 1 << b
    val maxRho = 60 - b + 1
    val gcols = groupCols.map(col)
    // S = sum of 2^(maxRho - M) over present registers: integer, exact.
    // Absent registers have M = 0 -> term 2^maxRho, added arithmetically.
    val twoPowMax = 1L << maxRho
    val alphaNum = 0.7213 / (1 + 1.079 / m) * m * m * twoPowMax.toDouble
    registers
      .groupBy(gcols: _*)
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRho - M)")).as("_S"),
        count(lit(1)).as("_nb"))
      .withColumn("_zero", lit(m.toLong) - col("_nb"))
      .withColumn("_raw",
        lit(alphaNum) /
          (col("_S") + col("_zero") * lit(twoPowMax)).cast("double"))
      .withColumn("hll_est", round(
        when(col("_raw") <= lit(2.5 * m) && col("_zero") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("_zero")))
          .otherwise(col("_raw")), 6))
      .select(gcols :+ col("hll_est") :+ col("_zero").as("hll_zero_regs"): _*)
  }

  /** Portable count-min sketch (Cormode & Muthukrishnan 2005) of
    * `valueCol` frequencies: `d` hash rows × `w` buckets, counts summed
    * per (row, bucket) — a FIXED-SIZE frequency summary (`d·w` cells)
    * regardless of input size, the heavy-hitter shape for 100 TB: one
    * map-side-combining aggregation shuffling at most `d·w` rows where
    * exact counting shuffles every distinct key. Cells are additive, so
    * per-partition/per-day sketches merge by cell-wise sum. Row hashes
    * are md5-derived (`md5(row || ':' || value)` — the portable idiom),
    * so an external engine replays the sketch bit-exactly; counts are
    * integers, so there is no float-determinism caveat at all.
    * Returns (row int, bucket long, cnt long).
    */
  def countMinSketch(df: DataFrame, valueCol: String, d: Int = 4,
      w: Int = 512): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2; got d=$d w=$w")
    df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("string").as("_v"))
      .withColumn("row", explode(array((0 until d).map(lit): _*)))
      .withColumn("bucket", pmod(
        conv(substring(md5(concat(col("row").cast("string"), lit(":"),
          col("_v"))), 1, 15), 16, 10).cast("long"), lit(w.toLong)))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates from a [[countMinSketch]]: for each key
    * in `keys(keyCol)`, min over the `d` rows of the key's cell — the
    * classic CMS upper bound (estimate ≥ true count always; ≤ true +
    * εN with prob 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉). The lookup is a
    * broadcast-sized join of keys×d probe rows against the sketch —
    * never a scan of the original data.
    */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      d: Int = 4, w: Int = 512): DataFrame = {
    val probes = keys.select(col(keyCol))
      .withColumn("row", explode(array((0 until d).map(lit): _*)))
      .withColumn("bucket", pmod(
        conv(substring(md5(concat(col("row").cast("string"), lit(":"),
          col(keyCol).cast("string"))), 1, 15), 16, 10).cast("long"),
        lit(w.toLong)))
    probes.join(sketch, Seq("row", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_cnt"))
  }

  /** Log2 histogram quantile sketch over a nonnegative BIGINT column —
    * the third leg of the sketch trio (HLL distinct, CMS frequency,
    * this for rank/quantile), in the exponent-plus-mantissa bucket
    * layout popularized by HdrHistogram (Tene) and the log-bucket
    * family of DDSketch (Masson, Rim & Lee, VLDB 2019). Each value
    * keeps its top `subBits`+1 significant bits: shift
    * s = max(0, bitlen(v)−1−subBits), bucket = (s, v >> s). Buckets
    * are disjoint, cover all of [0, 2^63), and a bucket's width over
    * its lower bound is at most 2^−subBits — so the midpoint estimate
    * carries a RELATIVE error ≤ 2^−(subBits+1) at any quantile
    * (subBits=6 → ≤ 0.8%).
    *
    * Everything is integer arithmetic on the value's own bits — no
    * log(), no float anywhere — so the sketch replays BIT-EXACTLY in
    * any engine with `bin`/shifts (the DuckDB oracle does), unlike
    * Spark's `approx_percentile` whose GK internals aren't replayable.
    *
    * 100 TB posture: one map-side-combining aggregation to at most
    * ~(64−subBits)·2^subBits + 2^subBits cells per group (≈ 3.8k at
    * subBits=6) regardless of input size — exact percentiles shuffle
    * every distinct value and need a full sort per group. Cells are
    * additive, so per-partition/per-day histograms merge by cell-wise
    * sum and the streaming form is the same running sum.
    * Returns (groupCols*, s int, top long, cnt long).
    */
  def logHistogram(df: DataFrame, groupCols: Seq[String], valueCol: String,
      subBits: Int = 6): DataFrame = {
    require(subBits >= 1 && subBits <= 62, s"subBits in [1,62], got $subBits")
    val gcols = groupCols.map(col)
    val v = col(valueCol).cast("long")
    df.where(v.isNotNull && v >= 0)
      .select(gcols :+ v.as("_v"): _*)
      // bitlen(v) = length(bin(v)) for v > 0; v = 0 folds into s = 0,
      // top = 0 with no special case (bin(0) = "0", len 1)
      .withColumn("s", greatest(
        length(bin(col("_v"))).cast("int") - lit(1 + subBits), lit(0)))
      .withColumn("top", expr("shiftright(_v, s)"))
      .groupBy(gcols :+ col("s") :+ col("top"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from a [[logHistogram]]: for each group and
    * each rational quantile (name, num, den), the midpoint of the
    * bucket containing rank ⌈n·num/den⌉ (1-based, the "nearest-rank"
    * definition — exact-rank arithmetic is integer: (n·num+den−1) div
    * den, so there is no float q·n anywhere). Bucket midpoint
    * (top << s) + (2^s − 1) div 2 is monotone in the bucket lower
    * bound, so min() over qualifying buckets picks the right one.
    * Returns (groupCols*, qname string, est long) — relative error of
    * est vs the true rank value ≤ 2^−(subBits+1).
    */
  def histQuantiles(hist: DataFrame, groupCols: Seq[String],
      quantiles: Seq[(String, Int, Int)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val lower = expr("shiftleft(top, s)")
    val w = Window.partitionBy(gcols: _*).orderBy(lower)
    val wAll = Window.partitionBy(gcols: _*)
    // (2^s − 1) div 2 without float division: 2^(s−1) − 1 for s ≥ 1, 0 at s = 0
    val halfWidth = when(col("s") === 0, lit(0L))
      .otherwise(expr("shiftleft(1L, s - 1)") - lit(1L))
    val cum = hist
      .withColumn("_est", lower + halfWidth)
      .withColumn("_cum", sum(col("cnt")).over(w))
      .withColumn("_n", sum(col("cnt")).over(wAll))
    val spec = quantiles.map { case (nm, num, den) =>
      struct(lit(nm).as("qname"), lit(num.toLong).as("num"),
        lit(den.toLong).as("den"))
    }
    cum.withColumn("_q", explode(array(spec: _*)))
      .select(gcols ++ Seq(col("_q.qname").as("qname"), col("_est"),
        col("_cum"), col("_n"), col("_q.num"), col("_q.den")): _*)
      .where(col("_cum") >= expr("(_n * num + den - 1) div den"))
      .groupBy(gcols :+ col("qname"): _*)
      .agg(min(col("_est").cast("long")).as("est"))
  }
}

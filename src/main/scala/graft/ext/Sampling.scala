package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus balancing. Unlike
  * `DataFrame.sample` (partition-order-dependent RNG), the keep decision is
  * a pure function of the row's key — reproducible across runs, engines,
  * repartitionings, and incremental re-ingests, which is what a training
  * pipeline needs when a sample must be stable under corpus growth. The
  * whole operator is scan → codegen'd filter: no shuffle, no state.
  */
object Sampling {

  /** Uniform [0,1) hash of a key column: first 60 bits of
    * md5(key ":" salt) over 2^60. md5-derived so any engine replays the
    * identical decision (the DuckDB oracle does); long→double rounding is
    * IEEE round-to-nearest in both engines.
    */
  def uniformHash(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":" + salt))
      .cast("binary")), 1, 15), 16, 10)
      .cast("long").cast("double") / lit(1.152921504606846976e18)

  /** Keep each row iff its key's uniform hash clears the rate of its
    * stratum (e.g. per-language rates to rebalance a multilingual corpus);
    * strata not in `rates` get `defaultRate`.
    */
  def stratifiedSample(df: DataFrame, stratum: Column,
      rates: Map[String, Double], defaultRate: Double,
      keyCol: String = "doc_id", salt: String = "strat"): DataFrame = {
    // single map lookup, NOT a when()-chain: a chain references `stratum`
    // once per rate entry, and when the stratum is a computed column
    // (e.g. langId) predicate pushdown inlines that computation into the
    // Filter, whose codegen does no subexpression elimination — each extra
    // reference re-evaluates it per row
    val rate =
      if (rates.isEmpty) lit(defaultRate)
      else coalesce(
        element_at(
          map(rates.toSeq.flatMap { case (k, r) => Seq(lit(k), lit(r)) }: _*),
          stratum),
        lit(defaultRate))
    df.filter(uniformHash(col(keyCol), salt) < rate)
  }

  /** Temperature-scaled mixture resampling (the multilingual-corpus
    * rebalancing rule from the mBERT/XLM-R line of work): stratum s with
    * count c_s gets mixture weight w_s ∝ c_s^alpha, and each row of s is
    * kept with rate
    *
    *   r_s = min(1, targetFrac · N · w_s / (Σw · c_s))
    *
    * so the expected kept volume is targetFrac·N distributed by the
    * tempered weights — alpha = 1 reproduces the corpus as-is, alpha = 0
    * equalizes strata, alpha = 0.5 is the usual compromise that up-weights
    * low-resource strata without flattening the head.
    *
    * Physical shape: one tiny aggregate over the stratum column (map-side
    * combined to #strata rows), a scalar cross of its totals, and a
    * broadcast join of the per-stratum rate back onto the scan — the corpus
    * itself is never shuffled, so the operator scales with the scan. The
    * keep decision reuses [[uniformHash]], so the sample is reproducible
    * across runs, engines, and repartitionings; rates are rounded to 6
    * decimals so an external replayer (the DuckDB oracle) computes the
    * identical boundary even when its pow/sum ULPs differ.
    */
  /** The per-stratum rate table (_stratum, rate) behind
    * [[temperatureResample]], exposed separately so the rates computed on
    * a reference corpus can be applied elsewhere — most usefully to a
    * STREAM via [[applyRates]] (rate derivation needs a global aggregate,
    * which a stream can't do; compute-on-batch / apply-on-stream is the
    * production split).
    */
  def temperatureRates(df: DataFrame, stratum: Column, alpha: Double,
      targetFrac: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    require(targetFrac > 0.0 && targetFrac <= 1.0,
      s"targetFrac must be in (0,1], got $targetFrac")
    val counts = df.groupBy(stratum.as("_stratum"))
      .agg(count(lit(1)).cast("double").as("_cnt"))
    val totals = counts.agg(
      sum(col("_cnt")).as("_n_total"),
      sum(pow(col("_cnt"), lit(alpha))).as("_w_total"))
    counts.crossJoin(broadcast(totals))
      .select(col("_stratum"),
        round(least(lit(1.0),
          lit(targetFrac) * col("_n_total") * pow(col("_cnt"), lit(alpha)) /
            (col("_w_total") * col("_cnt"))), 6).as("rate"))
  }

  /** Apply a (_stratum, rate) table to a batch OR streaming frame: a
    * broadcast (stream-static) join plus the stateless md5 keep decision —
    * rows whose stratum has no rate are dropped (no rate = not in the
    * reference mix). Null-safe on the stratum: a null stratum is a
    * legitimate group and must not be dropped by the join.
    */
  def applyRates(df: DataFrame, stratum: Column, rates: DataFrame,
      keyCol: String = "doc_id", salt: String = "mix"): DataFrame =
    df.join(broadcast(rates), stratum <=> col("_stratum"))
      .filter(uniformHash(col(keyCol), salt) < col("rate"))
      .drop("_stratum")

  /** Temperature resampling in one step: rates from [[temperatureRates]]
    * applied back to the same frame via [[applyRates]].
    */
  def temperatureResample(df: DataFrame, stratum: Column, alpha: Double,
      targetFrac: Double, keyCol: String = "doc_id",
      salt: String = "mix"): DataFrame =
    applyRates(df, stratum,
      temperatureRates(df, stratum, alpha, targetFrac), keyCol, salt)

  /** Per-stratum adaptive top-fraction gate: within each stratum, keep
    * the rows ranking in the top `frac` by `score` (ties broken by
    * `keyCol` so the cut is total and replayable). This is the
    * per-source dynamic quality threshold real curation pipelines use
    * instead of one global cutoff — a noisy source keeps only its best
    * slice while a clean source passes mostly intact, with NO per-source
    * tuning constant.
    *
    * The kept count is ceil(frac · n) in IEEE-double arithmetic — no
    * percentile interpolation, so any engine that evaluates the product
    * as a double reproduces the identical cut (note the double semantics
    * are load-bearing at representation edges: frac=0.3, n=10 gives
    * 3.0000000000000004 and keeps 4 rows, and e.g. DuckDB agrees because
    * it computes the same product; a true-rational ceil would keep 3).
    * Physical
    * shape: one hash exchange on the stratum, per-stratum window
    * (row_number + count over the same partitioning — one sort, no
    * global window), then the filter; skew is bounded by the largest
    * single stratum, the same bound the per-source scorecard (q83)
    * already lives with.
    */
  def topFractionByStratum(df: DataFrame, stratum: Column, score: Column,
      frac: Double, keyCol: String = "doc_id"): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0,1], got $frac")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(stratum)
    df.withColumn("_rn", row_number().over(
        w.orderBy(score.desc, col(keyCol).asc)))
      .withColumn("_n", count(lit(1)).over(w))
      .filter(col("_rn").cast("double") <= ceil(lit(frac) * col("_n")))
      .drop("_rn", "_n")
  }

  /** Frozen per-stratum admission thresholds for [[topFractionByStratum]]
    * — the side-input its STREAMING/INCREMENTAL form gates against. The
    * gate itself is holistic (a row's admission depends on its rank
    * within the whole stratum), so no row-at-a-time operator can replay
    * it exactly over an unbounded stream; the production decomposition is
    * the same one the boilerplate scrub uses (q96→q98): recompute the
    * thresholds over history on a refresh cadence, then admit each
    * arriving row STATELESSLY against the frozen cut. One row per
    * stratum: the (score, key) of the last row the gate admits, so the
    * threshold captures the gate's total tie-broken order exactly, not a
    * score alone.
    */
  def stratumThresholds(df: DataFrame, stratum: Column, score: Column,
      frac: Double, keyCol: String = "doc_id"): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0,1], got $frac")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(stratum)
    df.withColumn("_rn", row_number().over(
        w.orderBy(score.desc, col(keyCol).asc)))
      .withColumn("_n", count(lit(1)).over(w))
      .filter(col("_rn").cast("double") === ceil(lit(frac) * col("_n")))
      .select(stratum.as("_stratum"), score.as("_cut_score"),
        col(keyCol).as("_cut_key"))
  }

  /** Stateless admission gate against frozen [[stratumThresholds]]: a row
    * is admitted iff it sorts at-or-above the cut in the gate's
    * (score desc, key asc) order. Per-row decidable with only the
    * broadcast threshold table as state — exactly the shape a
    * `readStream` pipeline evaluates (broadcast join + filter; no
    * shuffle, no window), and therefore batch/stream identical by
    * construction: gating a union equals the union of gating each batch.
    * Parity with the holistic gate is pinned by SamplingSpec — replaying
    * the SAME corpus the thresholds were derived from reproduces
    * `topFractionByStratum` row-for-row. A stratum absent from the
    * thresholds admits nothing until the next refresh (conservative for
    * a brand-new source; relax by unioning a default threshold row).
    */
  def gateAgainstThresholds(batch: DataFrame, stratum: Column, score: Column,
      thresholds: DataFrame, keyCol: String = "doc_id"): DataFrame =
    batch.join(broadcast(thresholds), stratum <=> col("_stratum"))
      .filter(score > col("_cut_score") ||
        (score === col("_cut_score") && col(keyCol) <= col("_cut_key")))
      .drop("_stratum", "_cut_score", "_cut_key")

  /** Per-stratum integer weight totals (_stratum, _wsum) — the tiny
    * side-input of [[weightedBernoulliSample]]. The weight is cast to
    * long BEFORE summing so the total is exact and partition-order
    * independent (a double sum would vary run to run); freeze the table
    * from a published history snapshot to make the weighted gate
    * stateless over a stream, exactly the [[stratumThresholds]] pattern.
    */
  def weightedTotals(df: DataFrame, stratum: Column,
      weight: Column): DataFrame =
    df.groupBy(stratum.as("_stratum"))
      .agg(sum(weight.cast("long")).as("_wsum"))

  /** Expected-k weighted Bernoulli sample per stratum (probability-
    * proportional-to-size curation — sample longer/higher-quality
    * documents proportionally more): each row is kept independently iff
    * uniformHash(key) < k·w / ΣW_stratum, so inclusion probability is
    * min(1, k·w/ΣW) and the expected kept count per stratum is ≈ k
    * (exactly k minus the saturated mass of rows with w ≥ ΣW/k — the
    * heavy-row cap every PPS scheme has). Deterministic cross-engine:
    * the weight and ΣW are exact longs, long→double casts are exact
    * below 2^53, and the decision's one multiply + one divide are IEEE
    * operations every engine rounds identically — no transcendentals,
    * so the DuckDB oracle replays the decision bit-for-bit.
    * Physical shape: one tiny aggregate broadcast back onto a
    * scan-shaped filter; with a frozen `totals` table the gate is
    * stateless and runs unchanged on a stream.
    */
  def weightedBernoulliSample(df: DataFrame, stratum: Column,
      weight: Column, k: Int, totals: DataFrame,
      keyCol: String = "doc_id", salt: String = "wsamp"): DataFrame =
    df.join(broadcast(totals), stratum === col("_stratum"))
      .filter(uniformHash(col(keyCol), salt) <
        lit(k) * weight.cast("long").cast("double") /
          col("_wsum").cast("double"))
      .drop("_stratum", "_wsum")

  /** EXACT-k deterministic per-stratum sample (the eval-holdout
    * constructor): rank each stratum's rows by the md5 uniform of the
    * key and keep the first `k` — a distributed reservoir whose
    * "random" order is a pure function of the key, so the holdout is
    * stable under reruns, repartitioning, AND corpus growth (a new doc
    * displaces at most one row of its stratum, it never reshuffles the
    * whole holdout the way rate-based sampling re-draws do). Strata
    * smaller than `k` keep everything. Ranking is the two-phase
    * bounded `operators.TopK` — per-input-partition pre-prune, never a
    * stratum-wide single-task sort.
    */
  def exactKPerStratum(df: DataFrame, stratum: Column, k: Int,
      keyCol: String = "doc_id", salt: String = "hold"): DataFrame = {
    val u = uniformHash(col(keyCol), salt)
    graft.operators.TopK.topKPerKey(
      df.withColumn("_u", u), Seq(stratum), Seq(col("_u"), col(keyCol)), k)
      .drop("_u")
  }
}

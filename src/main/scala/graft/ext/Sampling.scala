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
}

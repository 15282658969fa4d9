package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR — Xie et al., NeurIPS
  * 2023): rank raw documents by how target-like they are under cheap
  * hashed n-gram bag-of-words models, then sample the training subset in
  * proportion to the importance weight. The reference pipeline has no
  * model-based selection at all; this is the standard pretraining-corpus
  * curation step the brief's LLM-pipeline surface calls for, and every
  * stage is engine-replayable (md5-derived hashing, closed-form counts)
  * so the DuckDB oracle reproduces the selection bit-for-bit.
  *
  * Method: each document's feature bag is its unigrams + adjacent-word
  * bigrams hashed into `buckets` buckets. Two multinomial models are
  * fitted by counting bucket mass — `p` over the TARGET slice (the
  * domain to match, e.g. one language or a quality-gated subset) and `q`
  * over the full RAW corpus — with add-one smoothing. A document's
  * importance log-weight is Σ_features [ln p(b) − ln q(b)], the
  * log-likelihood ratio under the bag models. Selection is k docs
  * WITHOUT replacement with probability ∝ exp(logw) via the Gumbel
  * top-k trick (Efraimidis–Spirakis order sampling): key = logw + G
  * where G = −ln(−ln u) and u is the md5 uniform of the doc id — so the
  * "randomness" is a pure function of the id, reproducible across runs,
  * partitionings, and engines.
  *
  * Scale shape (the part that must survive 100 TB): ONE tokenize-explode
  * scan feeds a `buckets`-row conditional aggregate (map-side combined —
  * raw and target counts in one pass, no second scan for the target
  * model); the bucket→log-ratio table is bounded by `buckets` (fixed,
  * paper uses 10k) so it broadcasts; scoring is the same explode joined
  * to that broadcast plus one shuffle on the doc id; selection is the
  * two-phase per-partition top-k (`operators.TopK`), never a global
  * sort. Nothing grows with corpus size except the scans.
  */
object Dsir {

  /** Hashed unigram+bigram feature-bucket stream: (idCol, bkt) one row
    * per feature OCCURRENCE (bag semantics — DSIR counts, not sets).
    * Bucket = md5-60(feature) mod `buckets`; bigrams are joined with
    * '_' so "a b_c" and "a_b c" cannot collide as strings. The whole
    * extractor (lowercase → split → ngrams → md5 → mod) is ONE
    * codegen'd kernel pass (`NgramBuckets`) — the equivalent
    * split/transform/concat/md5/conv column chain cost ~5× more wall
    * clock on the 30× probe, almost all of it hex-string churn.
    */
  def featureBuckets(docs: DataFrame, buckets: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
      explode(graft.functions.native.ngramBuckets(col(textCol), buckets))
        .as("bkt"))

  /** Per-bucket importance log-ratio table (bkt, lr): ln of the
    * add-one-smoothed target bucket probability over the raw one. One
    * conditional aggregate over the feature stream computes BOTH models
    * (`isTarget` marks the target slice — no second scan), and the
    * 1-row totals ride a broadcast scalar cross, the same shape as
    * [[Sampling.temperatureRates]].
    *
    * The table covers the FULL hash domain — exactly `buckets` rows
    * (still broadcastable at any corpus size: the domain is fixed, the
    * paper uses 10k) — with zero-count buckets carrying the smoothed
    * unseen-bucket ratio ln(1/(ttot+B)) − ln(1/(rtot+B)) that add-one
    * smoothing implies. This is what makes [[scoreAgainst]]'s join
    * total on the compute-on-reference / apply-on-stream path: a
    * refresh-batch feature hashing to a bucket the reference corpus
    * never produced gets the smoothed ratio instead of being silently
    * dropped (the previous seen-buckets-only table treated such
    * features as lr = 0 and lost all-unseen documents entirely).
    * In-corpus scoring (q122/q129) is unchanged — every in-corpus
    * feature is by construction a seen bucket.
    */
  def bucketLogRatios(feats: DataFrame, isTarget: Column,
      buckets: Int): DataFrame = {
    val counts = feats.groupBy(col("bkt")).agg(
      count(lit(1)).as("raw_n"),
      count(when(isTarget, 1)).as("tgt_n"))
    val totals = counts.agg(
      coalesce(sum(col("raw_n")), lit(0L)).as("_rtot"),
      coalesce(sum(col("tgt_n")), lit(0L)).as("_ttot"))
    feats.sparkSession.range(buckets).select(col("id").as("bkt"))
      .join(counts, Seq("bkt"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bkt"),
        (log((coalesce(col("tgt_n"), lit(0L)) + lit(1.0))
            / (col("_ttot") + lit(buckets.toDouble)))
          - log((coalesce(col("raw_n"), lit(0L)) + lit(1.0))
            / (col("_rtot") + lit(buckets.toDouble))))
          .as("lr"))
  }

  /** Per-document importance log-weights against the `isTarget` slice:
    * (idCol, _logw) for every doc with ≥ 1 feature — the scoring stage
    * of [[resample]], exposed for the diagnostics ([[essAudit]]) and
    * for selection-free use.
    */
  def scores(docs: DataFrame, isTarget: Column, buckets: Int = 1024,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // isTarget references doc columns (e.g. lang), so evaluate it into
    // the feature stream before column pruning drops its inputs
    val withFlag = docs.withColumn("_is_tgt", isTarget)
      .select(col(idCol), col("_is_tgt"), col(textCol))
    val fb = featureBucketsWithFlag(withFlag, buckets, textCol, idCol)
    val ratios = bucketLogRatios(fb, col("_is_tgt"), buckets)
    scoreAgainst(docs, ratios, buckets, textCol, idCol)
  }

  /** DSIR selection: importance-score every document against the
    * `isTarget` slice and keep `k` docs sampled without replacement with
    * probability ∝ exp(score), deterministically (Gumbel keys from the
    * md5 uniform of the id). Returns (idCol, dsir_logw rounded to 6dp)
    * — the log-weight is the auditable artifact (it IS the selection
    * score); rounding keeps the external-replay compare exact while the
    * ranking itself uses the raw double.
    */
  def resample(docs: DataFrame, isTarget: Column, k: Int,
      buckets: Int = 1024, textCol: String = "text",
      idCol: String = "doc_id", salt: String = "dsir"): DataFrame = {
    val keyed = scores(docs, isTarget, buckets, textCol, idCol)
      .withColumn("_gkey",
        col("_logw") - log(-log(Sampling.uniformHash(col(idCol), salt))))
    graft.operators.TopK.topKPerKey(keyed, Seq.empty,
      Seq(col("_gkey").desc, col(idCol)), k)
      .select(col(idCol), round(col("_logw"), 6).as("dsir_logw"))
  }

  /** Importance-weight health diagnostics — the audit run BEFORE
    * trusting any importance-resampled corpus (a collapsed weight
    * distribution silently turns "resample toward the target" into
    * "keep 12 documents"): effective sample size
    * ESS = (Σw)²/Σw² (Kong 1992), its fraction of n, and the largest
    * single weight's share of the total mass. Weights are normalized by
    * the max in log space (w̃ = exp(logw − max)) so the sums never
    * overflow; ESS and the shares are scale-invariant so the
    * normalization cancels. Two scalar aggregates (max, then the sums
    * against the broadcast max) — nothing wider than the score table is
    * ever shuffled.
    */
  def essAudit(docs: DataFrame, isTarget: Column, buckets: Int = 1024,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sc = scores(docs, isTarget, buckets, textCol, idCol)
    val mx = sc.agg(max(col("_logw")).as("_mx"))
    sc.crossJoin(broadcast(mx))
      .select(exp(col("_logw") - col("_mx")).as("_w"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_w")).as("_s1"), sum(col("_w") * col("_w")).as("_s2"))
      .select(col("n_docs"),
        round(col("_s1") * col("_s1") / col("_s2"), 6).as("ess"),
        round(col("_s1") * col("_s1") / (col("_s2") * col("n_docs")), 6)
          .as("ess_frac"),
        round(lit(1.0) / col("_s1"), 6).as("max_weight_share"))
  }

  /** Score documents against a PRE-COMPUTED bucket log-ratio table:
    * (idCol, _logw). This is the apply side of the compute-on-reference
    * / apply-on-batch split ([[Sampling.applyRates]]' pattern): the
    * ratio table is derived once from a reference corpus and each
    * refresh batch — or STREAM; the scoring plan is a broadcast
    * stream-static join plus one per-doc aggregate, parity-pinned in
    * `DsirSpec` — is scored without touching the reference again. The
    * join is TOTAL because [[bucketLogRatios]] emits the full hash
    * domain: features the reference corpus never produced score the
    * smoothed unseen-bucket ratio, so no refresh document is dropped
    * for hashing off the reference's support.
    */
  def scoreAgainst(docs: DataFrame, ratios: DataFrame, buckets: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    featureBuckets(docs, buckets, textCol, idCol)
      .join(broadcast(ratios), Seq("bkt"))
      .groupBy(col(idCol))
      .agg(sum(col("lr")).as("_logw"))

  /** [[featureBuckets]] carrying the `_is_tgt` flag through the explode
    * so both models come out of one aggregate.
    */
  private def featureBucketsWithFlag(docs: DataFrame, buckets: Int,
      textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol), col("_is_tgt"),
      explode(graft.functions.native.ngramBuckets(col(textCol), buckets))
        .as("bkt"))
}

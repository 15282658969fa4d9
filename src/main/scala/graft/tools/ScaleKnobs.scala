package graft.tools

import org.apache.spark.sql.SparkSession

/** Optional shuffle-width env knobs shared by the Bench/QTime harnesses
  * (default off — absent envs leave the builder untouched).
  *
  * At ≥30× probe scale the fixed reducer width spills on explode-heavy
  * self-joins, and widening `initialPartitionNum` alone is undone by AQE
  * coalescing back to the 64m ADVISORY target — which is measured in
  * compressed wire bytes, ~10× below the in-memory expansion of exploded
  * postings. Set both together, e.g.
  * `SPARK_GRAFT_INIT_PARTS=256 SPARK_GRAFT_ADVISORY=8m`.
  */
object ScaleKnobs {
  def apply(builder: SparkSession.Builder): SparkSession.Builder = {
    val b0 = builder.config("spark.sql.codegen.cache.maxEntries",
      sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
    // codegen class cache (static conf, default 100 entries): a suite of
    // 161 distinct queries compiles ~1000+ whole-stage/expression codegen
    // units, so the default cache thrashes and every bench pass re-pays
    // Janino compilation for almost every stage. 4096 entries holds the
    // full suite; scale-neutral (any long-lived app with many distinct
    // plans — a real cluster driver included — wants the same), and
    // env-overridable for A/B.
    val b1 = b0.config("spark.sql.extensions",
      "graft.functions.GraftExtensions")
    val b2 = sys.env.get("SPARK_GRAFT_INIT_PARTS").fold(b1)(n =>
      b1.config(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", n))
    val b3 = sys.env.get("SPARK_GRAFT_ADVISORY").fold(b2)(s =>
      b2.config("spark.sql.adaptive.advisoryPartitionSizeInBytes", s))
    // A/B lever for injected optimizer rules (comma-separated rule names)
    sys.env.get("SPARK_GRAFT_EXCLUDED_RULES").fold(b3)(r =>
      b3.config("spark.sql.optimizer.excludedRules", r))
  }
}

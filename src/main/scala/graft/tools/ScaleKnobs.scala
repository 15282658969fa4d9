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
    val b1 = builder.config("spark.sql.extensions",
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

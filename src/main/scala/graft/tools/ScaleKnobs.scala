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
    val b2 = sys.env.get("SPARK_GRAFT_INIT_PARTS").fold(builder)(n =>
      builder.config(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", n))
    sys.env.get("SPARK_GRAFT_ADVISORY").fold(b2)(s =>
      b2.config("spark.sql.adaptive.advisoryPartitionSizeInBytes", s))
  }
}

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

  private def dirBytes(f: java.io.File): Long =
    if (f.isFile) f.length
    else Option(f.listFiles()).map(_.iterator.map(dirBytes).sum).getOrElse(0L)

  /** [[apply]] plus SCALE-ADAPTIVE shuffle width derived from the input
    * directory's size (round 16): a fixed
    * `initialPartitionNum = cpus` is tuned for exactly one scale — at
    * the 100× replica the posting-join tail spills into 32 reducers
    * (measured: q117 55.6 s → 29.1 s, q116 19.5 → 14.0, q84 27.5 → 21.3
    * warm at 100× with 256 initial partitions) while 256 initial
    * partitions at sf0.1 pay ~+5 s of map-output/planning overhead
    * across the suite. Deriving `initial = clamp(bytes/8 MB, cpus,
    * 16·cpus)` gives each scale its own width and lets AQE coalesce
    * down per stage. The 8 MB ADVISORY (vs the 64 MB default) is the
    * matching coalesce target: advisory is measured in compressed WIRE
    * bytes and the explode-heavy posting shuffles expand ~10× in
    * memory, so 8 MB wire ≈ 80 MB in-memory — the optimization guide's
    * recommended partition size — where 64 MB wire re-merged the wide
    * shuffles AQE was just given room for (the documented
    * INIT_PARTS/ADVISORY interaction, now the default instead of a
    * sweep-only env pairing; measured −4.4 s at sf0.1 on its own,
    * 137/161 queries improving). Both envs still override.
    */
  def forDir(builder: SparkSession.Builder, dataDir: String,
      cpus: Int): SparkSession.Builder = {
    val c = math.max(cpus, 1).toLong
    val derived = math.max(c,
      math.min(c * 16, dirBytes(new java.io.File(dataDir)) / (8L << 20)))
    apply(builder
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        derived.toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m"))
  }
}

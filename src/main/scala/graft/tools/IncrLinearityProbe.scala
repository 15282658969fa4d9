package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Linearity probes separating PRODUCTION shape from REPLICA-TEST shape
  * for the two queries whose sweep ratios exceed linear without a
  * quadratic plan (round-10 verdict item 4):
  *
  *  - q107 (incremental substring admission): in replica scaling the
  *    BATCH grows with the corpus (batch = doc_id % 5 == 0 of the whole
  *    replica), so the sweep ratio mixes batch growth into what is
  *    billed as history growth. Production fixes the batch (a refresh
  *    is arrival-sized); probe A holds the batch at the base-sf size
  *    and scales ONLY history 30×→100×.
  *
  *  - q104 (BPE pair statistics): replica scaling translates every
  *    token per replica (`_r<i>` suffix — deliberate, to keep
  *    cross-replica Jaccard at 0 for the dedup family), so the DISTINCT
  *    vocabulary grows N× — but BPE's aggregate state is exactly
  *    vocabulary-sized, so the test artifact inflates the very table
  *    whose boundedness is the operator's scale argument. Real corpus
  *    growth keeps vocabulary sublinear (Heaps' law); probe B scales
  *    volume with the vocabulary FIXED (verbatim text replication,
  *    offset ids) and reports both curves.
  *
  * Usage: IncrLinearityProbe <baseSf> <replica30> <replica100>
  * (defaults /root/testdata/sf0.1 /tmp/sf30x /tmp/sf100x). Prints one
  * table row per (probe, scale): min-of-2 warm seconds.
  */
object IncrLinearityProbe {
  def main(args: Array[String]): Unit = {
    val base = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val r30 = args.lift(1).getOrElse("/tmp/sf30x")
    val r100 = args.lift(2).getOrElse("/tmp/sf100x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = ScaleKnobs(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs(dir: String): DataFrame =
      graft.core.Tables.load(spark, dir, "documents")
    def time(label: String)(f: => Long): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label: ${runs.map(_._1).min}%.2f s (rows=${runs.head._2})")
    }

    // ---- probe A: q107 admission, FIXED batch, history-only growth
    val batch = docs(base).filter(col("doc_id") % 5 === 0)
      .localCheckpoint() // pin the batch so each probe pays only admission
    println(s"probe A fixed batch: ${batch.count()} docs (base $base)")
    for ((tag, dir) <- Seq("base" -> base, "30x" -> r30, "100x" -> r100)) {
      val hist = docs(dir).filter(col("doc_id") % 5 =!= 0)
      time(s"A incr_substring fixedBatch hist=$tag")(
        graft.ext.Dedup.incrementalSubstringBatch(hist, batch)
          .select(col("doc_id")).count())
    }

    // ---- probe B: BPE pair stats, fixed vocabulary vs translated vocab
    // verbatim replication: same text (vocab FIXED), ids offset — the
    // real-growth shape for a vocabulary-bounded aggregate
    def verbatim(n: Int): DataFrame = {
      val d = docs(base)
      val span = d.agg(max(col("doc_id"))).head().getLong(0) + 1
      d.withColumn("_i", explode(sequence(lit(0), lit(n - 1))))
        .withColumn("doc_id", col("doc_id") + col("_i") * lit(span))
        .drop("_i")
        // match the replicas' SPLITTABLE layout (min(n, 256) files since
        // the round-13 ScaleGen fix): without this the verbatim frame
        // inherits the single-file base's one partition and the probe
        // re-creates the serial-scan artifact it exists to factor out —
        // the first splittable-replica re-run measured fixedVocab 6.9×
        // SLOWER than the translated replica at 100× from exactly this.
        // min(n, 256) MATCHES ScaleGen.scala's replica file count — an
        // earlier n*8 over-parallelized the verbatim side at n=30 (240
        // partitions vs the replica's 30 files), biasing the comparison
        // the other way.
        .repartition(math.min(n, 256))
        .localCheckpoint() // exclude the replication itself from timing
    }
    for ((tag, df) <- Seq("base" -> docs(base), "30x" -> verbatim(30),
        "100x" -> verbatim(100))) {
      time(s"B bpe_pairs fixedVocab $tag")(
        graft.ext.Bpe.bpePairCounts(df).count())
    }
    for ((tag, dir) <- Seq("30x" -> r30, "100x" -> r100)) {
      time(s"B bpe_pairs translatedVocab $tag")(
        graft.ext.Bpe.bpePairCounts(docs(dir)).count())
    }
    spark.stop()
  }
}

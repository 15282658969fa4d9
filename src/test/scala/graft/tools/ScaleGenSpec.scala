package graft.tools

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The scale generator must preserve workload SHAPE, not just multiply
  * rows — these invariants are what make an N× run a valid linearity probe.
  */
class ScaleGenSpec extends SparkSpecBase {

  private val out = "/tmp/scalegen_spec"

  test("3x replica preserves counts, referential integrity, and structure") {
    ScaleGen.generate(spark, "/root/testdata/sf0.001", out, 3)

    def cnt(t: String): Long = spark.read.parquet(s"$out/$t.parquet").count()
    def srcCnt(t: String): Long =
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet").count()

    for (t <- Seq("customer", "orders", "lineitem", "documents", "embeddings", "events"))
      assert(cnt(t) == 3 * srcCnt(t), s"$t not exactly 3x")
    assert(cnt("nation") == srcCnt("nation")) // dims shared

    // every order still resolves to a customer (offsets kept fan-out intact)
    val orders = spark.read.parquet(s"$out/orders.parquet")
    val cust = spark.read.parquet(s"$out/customer.parquet")
    val dangling = orders.join(cust, col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(dangling == 0)

    // names stay a bijection of the key: verbatim-replicated names give
    // every name n exact copies and the fuzzy-join probe's dist-0 pairs
    // grow ~n² (caught by q94 at 30×: 55.8× time for 30× data)
    assert(cust.select("c_name").distinct().count() == cust.count(),
      "replicated customer names collide — fuzzy-join probe corpus is invalid")

    // replica vocabularies are disjoint: a cross-replica doc pair can never
    // be a near-dup, so similarity workload grows Nx, not N^2-ish
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val srcMax = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .agg(max(col("doc_id"))).head().getLong(0)
    val tok = docs
      .withColumn("replica", col("doc_id") / lit(srcMax + 1))
      .select(col("replica").cast("int").as("replica"),
        explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
    val shared = tok.filter(col("replica") === 0).select("t").distinct()
      .intersect(tok.filter(col("replica") === 1).select("t").distinct())
    assert(shared.count() == 0)

    // replicas must stay SPLITTABLE: an N× table written as one
    // explode-sized row group serializes every downstream scan stage on
    // one core (the round-13 finding — parquet only splits at row-group
    // boundaries), so fact tables fan out to min(n, 256) files
    for (t <- Seq("documents", "embeddings", "lineitem", "orders")) {
      val files = new java.io.File(s"$out/$t.parquet")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(files == 3, s"$t replica has $files files, expected n=3 " +
        "(single-row-group replicas serialize scan stages)")
    }

    // the docsfixed probe replica must match the full replica
    // byte-for-byte in token lengths (digit-width-matched suffixes) —
    // the parity that makes it a pure vocabulary-cardinality control
    ScaleGen.generateDocsFixedVocab(spark, "/root/testdata/sf0.001",
      "/tmp/scalegen_spec_fixed", 3)
    val fixedDocs = spark.read.parquet(
      "/tmp/scalegen_spec_fixed/documents.parquet")
    assert(fixedDocs.count() == docs.count())
    def chars(d: org.apache.spark.sql.DataFrame): Long =
      d.agg(sum(col("n_chars"))).head().getLong(0)
    assert(chars(fixedDocs) == chars(docs),
      "docsfixed text bytes diverge from the full replica — the q80 " +
        "vocabulary control would be confounded by raw volume")
    // ...while the vocabulary stays ~(1 + digit-widths)× base, vs ~n×
    val fixedVocab = fixedDocs
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").distinct().count()
    val fullVocab = tok.select("t").distinct().count()
    assert(fixedVocab < fullVocab,
      s"fixed vocab $fixedVocab not below full-replica vocab $fullVocab")

    // rotation is an isometry: the multiset of vector norms is unchanged
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    val normCounts = emb
      .select(round(sqrt(graft.functions.native.dotF(col("embedding"), col("embedding"))), 4).as("n"))
      .groupBy("n").count()
    val srcNormCounts = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(round(sqrt(graft.functions.native.dotF(col("embedding"), col("embedding"))), 4).as("n"))
      .groupBy("n").count()
      .withColumn("count", col("count") * 3)
    assert(normCounts.exceptAll(srcNormCounts).count() == 0)
  }

  test("composed runs stay collision-free (tagged vocab + tag-keyed flips)") {
    // Building N× in stages (e.g. 30× as 3× of a 10×) used to collide:
    // outer-replica-i of inner-replica-0 and inner-replica-i of
    // outer-replica-0 both applied the SAME translation (`_r<i>` suffix /
    // rotation i), cloning whole blocks across replicas and inflating
    // near-dup pair counts superlinearly (caught by the q84 probe at 30×).
    // The run tag keys both the vocab suffix and the embedding sign flips,
    // so every composition step is injective.
    val inner = "/tmp/scalegen_comp_inner"
    val outer = "/tmp/scalegen_comp_outer"
    ScaleGen.generate(spark, "/root/testdata/sf0.001", inner, 2)
    ScaleGen.generate(spark, inner, outer, 2)

    // block k = ids [k·span, (k+1)·span); the pre-fix clones were blocks
    // 1 (inner replica 1, outer replica 0) and 2 (inner 0, outer 1)
    val docs = spark.read.parquet(s"$outer/documents.parquet")
    val dSpan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .agg(max(col("doc_id"))).head().getLong(0) + 1
    def vocab(block: Long) = docs
      .filter(col("doc_id") >= block * dSpan && col("doc_id") < (block + 1) * dSpan)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").distinct()
    assert(vocab(1L).intersect(vocab(2L)).count() == 0,
      "composed replicas share vocabulary — near-dup probe corpus is invalid")

    val emb = spark.read.parquet(s"$outer/embeddings.parquet")
    val vSpan = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .agg(max(col("vec_id"))).head().getLong(0) + 1
    def vecs(block: Long) = emb
      .filter(col("vec_id") >= block * vSpan && col("vec_id") < (block + 1) * vSpan)
      .select(col("embedding"))
    assert(vecs(1L).intersect(vecs(2L)).count() == 0,
      "composed replicas contain identical vectors — ANN probe corpus is invalid")
  }
}

package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  // two tight clusters around orthogonal axes + one outlier
  private def vec(base: Array[Float], jitter: Float, seed: Int): Seq[Float] = {
    val r = new scala.util.Random(seed)
    base.map(v => v + (r.nextFloat() - 0.5f) * jitter).toSeq
  }
  private val ax = Array(1f, 0f, 0f, 0f)
  private val ay = Array(0f, 1f, 0f, 0f)
  private val embeddings = (
    (0L until 5L).map(i => (i, vec(ax, 0.1f, i.toInt))) ++
    (5L until 10L).map(i => (i, vec(ay, 0.1f, i.toInt))) :+
    (10L, Seq(-1f, -1f, 0f, 0f))
  ).toDF("vec_id", "embedding")

  test("dot/cosine column functions match hand computation") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    val d = df.select(Similarity.dot(col("a"), col("b"))).as[Double].head()
    assert(d == 32.0)
    val c = df.select(Similarity.cosine(col("a"), col("a"))).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("hard negatives exclude the anchor's own label and rank by similarity") {
    val labeled = embeddings.withColumn("label",
      when(col("vec_id") < 5, 0).when(col("vec_id") < 10, 1).otherwise(2))
    val got = Similarity.hardNegatives(labeled, k = 3)
      .select("anchor_label", "rank", "vec_id", "sim")
      .as[(Int, Long, Long, Double)].collect()
    assert(got.length == 9) // 3 anchors x k=3
    val byAnchor = got.groupBy(_._1)
    for ((a, rows) <- byAnchor) {
      assert(rows.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L))
      // similarity non-increasing in rank
      val sims = rows.sortBy(_._2).map(_._4)
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
      // no negative carries the anchor's own label
      val ownIds = a match {
        case 0 => (0L until 5L).toSet
        case 1 => (5L until 10L).toSet
        case _ => Set(10L)
      }
      assert(rows.map(_._3).forall(id => !ownIds.contains(id)))
    }
    // the outlier anchor (-1,-1,0,0) is closer to nothing: its best
    // negatives still have negative cosine against both axis clusters
    assert(byAnchor(2).forall(_._4 < 0.1))
  }

  test("prototypicality prune keeps the hardest fraction of each cluster") {
    val cents = Seq((0, ax.toSeq), (1, ay.toSeq))
    val kept = Similarity.prototypicalityPrune(embeddings, cents, keepFrac = 0.5)
      .select("bucket", "vec_id", "proto")
      .as[(Int, Long, Double)].collect()
    // brute-force expectation: assign by max cosine (tie → larger cid),
    // keep ceil(0.5*n) lowest-proto per bucket (ties by id)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val n = math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum)
      if (n == 0) 0.0 else d / n
    }
    val rows = embeddings.as[(Long, Seq[Float])].collect()
    val asg = rows.map { case (id, v) =>
      val scored = cents.map { case (cid, cv) => (cos(v, cv), cid) }
      val (s, cid) = scored.max
      (cid, id, s)
    }
    val want = asg.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy(r => (r._3, r._2)).take(math.ceil(0.5 * g.size).toInt).toSeq
    }.toSet
    assert(kept.toSet == want)
    // the anti-prototype outlier always survives
    assert(kept.exists(_._2 == 10L))
  }

  test("brute-force top-k returns the query's own cluster first") {
    val top = Similarity.bruteForceTopK(embeddings, Seq(1f, 0f, 0f, 0f), 5)
      .select("vec_id").as[Long].collect().toSet
    assert(top == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("IVF with enough probes reproduces brute-force exactly") {
    val centroids = Seq(0 -> ax.toSeq, 1 -> ay.toSeq)
    val bucketed = Similarity.assignBuckets(embeddings, centroids)
    // cluster-x vectors land in bucket 0, cluster-y in bucket 1
    val buckets = bucketed.select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    assert((0L until 5L).forall(buckets(_) == 0))
    assert((5L until 10L).forall(buckets(_) == 1))
    val q = Seq(0.9f, 0.1f, 0f, 0f)
    val bf = Similarity.bruteForceTopK(embeddings, q, 5).select("vec_id").as[Long].collect().toSeq
    val ivf = Similarity.ivfTopK(bucketed, centroids, q, 5, nprobe = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivf == bf)
    // nprobe=1 restricts to the nearest bucket only (the scale path)
    val ivf1 = Similarity.ivfTopK(bucketed, centroids, q, 5, nprobe = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(ivf1 == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("k-means refinement converges to the cluster axes and preserves IVF recall") {
    val centroids = Similarity.kmeansCentroids(embeddings, k = 2, iters = 3)
    assert(centroids.length == 2)
    // each refined centroid should strongly align with one axis
    val aligned = centroids.map { case (_, c) =>
      math.max(math.abs(c.head), math.abs(c(1)))
    }
    assert(aligned.forall(_ > 0.5))
    val bucketed = Similarity.assignBuckets(embeddings, centroids)
    val q = Seq(0.9f, 0.1f, 0f, 0f)
    val bf = Similarity.bruteForceTopK(embeddings, q, 5).select("vec_id").as[Long].collect().toSeq
    val ivf = Similarity.ivfTopK(bucketed, centroids, q, 5, nprobe = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivf == bf)
  }

  test("physically bucketed IVF index: identical results and partition-pruned scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val centroids = Seq(0 -> ax.toSeq, 1 -> ay.toSeq)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_idx").resolve("emb").toString
    Similarity.writeIvfIndex(embeddings, centroids, idx)
    val q = Seq(0.9f, 0.1f, 0f, 0f)
    val mem = Similarity.ivfTopK(Similarity.assignBuckets(embeddings, centroids),
      centroids, q, 5, nprobe = 1).select("vec_id").as[Long].collect().toSeq
    val fromIdx = Similarity.ivfTopKIndexed(spark, idx, centroids, q, 5, nprobe = 1)
    assert(fromIdx.select("vec_id").as[Long].collect().toSeq == mem)
    // the probe's bucket predicate must reach the scan as a PARTITION filter
    // (pruned at file listing), not a post-scan data filter — this is the
    // whole point of the physical index at 100 TB
    val scan = fromIdx.queryExecution.sparkPlan
      .collectFirst { case s: FileSourceScanExec => s }.get
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "bucket")),
      "bucket probe must be a partition filter on the index scan")
    val pruned = scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
    assert(pruned.length == 1,
      s"nprobe=1 must list exactly 1 of 2 bucket directories, got ${pruned.length}")
  }

  test("SQ8 index: quantized scoring recovers the query's cluster; no scale column stored") {
    val centroids = Seq(0 -> ax.toSeq, 1 -> ay.toSeq)
    val idx = java.nio.file.Files.createTempDirectory("graft_sq8").resolve("emb").toString
    Similarity.writeIvfIndexSQ8(embeddings, centroids, idx)
    val stored = spark.read.parquet(idx)
    // int8 payload only: no float embedding, no scale column in the index
    assert(stored.columns.sorted.toSeq == Seq("bucket", "qvec", "vec_id"))
    val q = Seq(0.9f, 0.1f, 0f, 0f)
    val sq8 = Similarity.ivfTopKSQ8(spark, idx, centroids, q, 5, nprobe = 2)
      .select("vec_id").as[Long].collect().toSet
    val exact = Similarity.bruteForceTopK(embeddings, q, 5)
      .select("vec_id").as[Long].collect().toSet
    // quantization is lossy but cluster-level recall holds on this fixture
    assert(sq8 == exact)
  }

  test("streaming IVF ingest: vectors searchable after their micro-batch, same results as batch index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val centroids = Seq(0 -> ax.toSeq, 1 -> ay.toSeq)
    val base = java.nio.file.Files.createTempDirectory("graft_ivf_stream")
    val idx = base.resolve("idx").toString
    val ckpt = base.resolve("ckpt").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val q = Similarity.streamingIvfIngest(
      input.toDF().toDF("vec_id", "embedding"), centroids, idx, ckpt)
    try {
      val rows = embeddings.as[(Long, Seq[Float])].collect().toSeq
      input.addData(rows.take(6)); q.processAllAvailable()
      input.addData(rows.drop(6)); q.processAllAvailable()
    } finally q.stop()
    val qv = Seq(0.9f, 0.1f, 0f, 0f)
    val streamedIdx = Similarity.ivfTopKIndexed(spark, idx, centroids, qv, 5, nprobe = 2)
      .select("vec_id").as[Long].collect().toSeq
    val mem = Similarity.ivfTopK(Similarity.assignBuckets(embeddings, centroids),
      centroids, qv, 5, nprobe = 2).select("vec_id").as[Long].collect().toSeq
    assert(streamedIdx == mem)
  }

  test("int8 quantization: values bounded, error within one quantum, dequant preserves direction") {
    val qz = embeddings
      .select(col("vec_id"), col("embedding"),
        Similarity.quantizeInt8(col("embedding")).as("qz"))
      .withColumn("deq", Similarity.dequantizeInt8(col("qz")))
    val rows = qz.select("embedding", "qz.scale", "qz.q", "deq")
      .as[(Seq[Float], Double, Seq[Int], Seq[Float])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (v, scale, q, deq) =>
      assert(q.forall(x => x >= -127 && x <= 127))
      // truncation error is below one quantum, plus the half-ULP the final
      // double→float cast in dequantizeInt8 can add
      v.zip(deq).foreach { case (orig, rec) =>
        assert(math.abs(orig - rec) <= scale + 1e-6,
          s"err ${math.abs(orig - rec)} > quantum $scale")
      }
      // direction essentially preserved (4-dim unit-ish vectors)
      val dot = v.zip(deq).map { case (a, b) => a.toDouble * b.toDouble }.sum
      val na = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(deq.map(x => x.toDouble * x.toDouble).sum)
      if (na > 0 && nb > 0) assert(dot / (na * nb) > 0.995)
    }
  }

  test("PQ: self-codes for seeds, ADC recovers the query cluster, index replays exactly") {
    // seed ids (the 4 smallest) must SPAN the clusters or the codebook
    // cannot separate them — two x seeds, two y seeds, then 4 more of each
    val pqData = (
      Seq((0L, vec(ax, 0.1f, 0)), (1L, vec(ax, 0.1f, 1)),
        (2L, vec(ay, 0.1f, 2)), (3L, vec(ay, 0.1f, 3))) ++
      (4L until 8L).map(i => (i, vec(ax, 0.1f, i.toInt))) ++
      (8L until 12L).map(i => (i, vec(ay, 0.1f, i.toInt)))
    ).toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooks(pqData, m = 2, k = 4)
    assert(books.length == 2 && books.forall(_.length == 4))
    // the seed vectors are their own sub-centroids: distance exactly 0 in
    // every subspace, so each encodes to itself
    val codes = pqData
      .select(col("vec_id"), Similarity.pqEncode(col("embedding"), books).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    (0 until 4).foreach(i => assert(codes(i.toLong) == Seq(i, i)))
    // ADC ranking against the x axis puts the whole x cluster first
    val top = Similarity.pqTopK(pqData, books, Seq(1f, 0f, 0f, 0f), 6)
      .as[Long].collect().toSeq
    assert(top.toSet == Set(0L, 1L, 4L, 5L, 6L, 7L))
    // the materialized code table replays the in-memory ranking row-for-row
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_spec").toString
    try {
      Similarity.writePqIndex(pqData, books, dir)
      val indexed = Similarity.pqTopKIndexed(spark, dir, books, Seq(1f, 0f, 0f, 0f), 6)
        .as[Long].collect().toSeq
      assert(indexed == top)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("PQ rerank: exact cosine order within the shortlist; full shortlist equals brute force") {
    val pqData = (
      Seq((0L, vec(ax, 0.1f, 0)), (1L, vec(ax, 0.1f, 1)),
        (2L, vec(ay, 0.1f, 2)), (3L, vec(ay, 0.1f, 3))) ++
      (4L until 8L).map(i => (i, vec(ax, 0.1f, i.toInt))) ++
      (8L until 12L).map(i => (i, vec(ay, 0.1f, i.toInt)))
    ).toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooks(pqData, m = 2, k = 4)
    val q = Seq(1f, 0f, 0f, 0f)
    // shortlist covering the whole corpus → rerank IS brute force
    val reranked = Similarity.pqRerankTopK(pqData, books, q, k = 5,
      shortlist = 12).as[Long].collect().toSeq
    val brute = Similarity.bruteForceTopK(pqData, q, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(reranked == brute)
    // a tight shortlist still yields results drawn from the ADC candidates
    val short = Similarity.pqTopK(pqData, books, q, 6).as[Long].collect().toSet
    val tight = Similarity.pqRerankTopK(pqData, books, q, k = 3,
      shortlist = 6).as[Long].collect().toSeq
    assert(tight.length == 3 && tight.forall(short.contains))
  }

  test("batched IVF equals the single-probe search run per query") {
    val emb = (0L until 40L).map(i =>
      (i, vec(if (i % 2 == 0) ax else ay, 0.1f, i.toInt))).toDF("vec_id", "embedding")
    val centroids = Similarity.sampleCentroids(emb, m = 4)
    val bucketed = Similarity.assignBuckets(emb, centroids)
    val queries = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val batch = Similarity.ivfTopKBatch(bucketed, centroids, queries,
      k = 5, nprobe = 2)
      .as[(Long, Long)].collect().toSet
    val single = queries.as[(Long, Seq[Float])].collect().flatMap {
      case (qid, qv) =>
        Similarity.ivfTopK(bucketed, centroids, qv, k = 5, nprobe = 2)
          .select("vec_id").as[Long].collect().map(qid -> _)
    }.toSet
    // probe tie-breaks are aligned (round 8): both ivfTopK's probeIds and
    // the batch kernel break centroid-sim ties toward the smaller cid,
    // so the probe sets agree by construction and results match exactly
    assert(batch == single && batch.nonEmpty)
    assert(batch.groupBy(_._1).forall(_._2.size == 5))
  }

  test("incremental cosine admission rejects batch echoes of history, admits novel") {
    val hist = (0L until 20L).map(i => (i * 2 + 1, vec(ax, 0.02f, i.toInt)))
      .toDF("vec_id", "embedding")
    // batch: 100 is a near-verbatim echo of history's direction, 102 is
    // (near-)orthogonal novel content
    val batch = Seq(
      (100L, vec(ax, 0.01f, 3)),
      (102L, vec(ay, 0.01f, 7))
    ).toDF("vec_id", "embedding")
    val admitted = Similarity.incrementalCosineDedupBatch(hist, batch,
      threshold = 0.9, planes = 64, bands = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(!admitted.contains(100L), "history echo must be rejected")
    assert(admitted.contains(102L), "novel direction must be admitted")
  }

  test("cosine near-dup pairs: same-cluster pairs found via banded LSH, none with outlier-orthogonal") {
    val pairs = Similarity.cosineNearDupPairs(embeddings, threshold = 0.9,
      planes = 8, bands = 4, dim = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.nonEmpty)
    // every reported pair is within one cluster (cos>=0.9 can't cross clusters)
    assert(pairs.forall { case (i, j) => (i < 5 && j < 5) || (i >= 5 && i < 10 && j >= 5 && j < 10) })
  }

  test("rproj sign matrix is deterministic, ±1, seed-sensitive") {
    val a = Similarity.rprojSigns(8, 4)
    val b = Similarity.rprojSigns(8, 4)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(s => s == 1.0f || s == -1.0f))
    assert(a.flatten.toSeq != Similarity.rprojSigns(8, 4, seed = "other").flatten.toSeq)
    // unbiased-ish: both signs occur
    assert(a.flatten.distinct.length == 2)
  }

  test("random projection is linear: proj(2v) = 2*proj(v)") {
    val signs = Similarity.rprojSigns(6, 3)
    val v = Seq(0.5f, -1.0f, 2.0f, 0.0f, 1.5f, -0.5f)
    val df = Seq((1L, v), (2L, v.map(_ * 2.0f))).toDF("vec_id", "embedding")
    val proj = df.select(col("vec_id"),
        Similarity.randomProject(col("embedding"), signs).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(proj(1L).map(_ * 2.0) == proj(2L))
  }

  test("materialized rproj index reproduces the on-the-fly reduced-space ranking") {
    val r = new scala.util.Random(11)
    val rows = (0L until 40L).map(i => i -> Seq.fill(12)(r.nextFloat() * 2 - 1))
    val df = rows.toDF("vec_id", "embedding")
    val qv = rows.head._2
    val idx = java.nio.file.Files.createTempDirectory("rproj_idx").toString
    Similarity.writeRprojIndex(df, dimIn = 12, dimOut = 6, path = idx)
    val direct = Similarity.rprojTopK(df, qv, k = 5, dimOut = 6)
      .select("vec_id").as[Long].collect().toSeq
    val indexed = Similarity.rprojTopKIndexed(spark, idx, qv, k = 5, dimOut = 6)
      .select("vec_id").as[Long].collect().toSeq
    assert(direct == indexed)
  }

  test("reduced-space top-k ranks same-direction vectors first") {
    val r = new scala.util.Random(7)
    val base = Array.fill(16)(r.nextFloat() * 2 - 1)
    val rows = Seq(
      0L -> base.toSeq,                       // the query itself
      1L -> base.map(_ * 2.0f).toSeq,         // same direction, cosine 1
      2L -> base.map(_ * 0.5f).toSeq          // same direction, cosine 1
    ) ++ (3L until 30L).map(i =>
      i -> Seq.fill(16)(r.nextFloat() * 2 - 1))
    val df = rows.toDF("vec_id", "embedding")
    val top = Similarity.rprojTopK(df, base.toSeq, k = 3, dimOut = 8)
      .select("vec_id").as[Long].collect().toSet
    // projection is linear, so scaled copies tie with the query at sim 1
    assert(top == Set(0L, 1L, 2L))
  }

  test("semantic dedup: within-cluster pairs found, low-cosine clustermates excluded") {
    val centroids = Seq(
      0 -> Seq(1f, 0f, 0f, 0f),
      1 -> Seq(0f, 1f, 0f, 0f))
    val vecs = Seq(
      (10L, Seq(1f, 0.1f, 0f, 0f)),     // cluster 0
      (11L, Seq(0.9f, 0.12f, 0f, 0f)),  // cluster 0, near-dup of 10
      (12L, Seq(0.2f, 0f, 0.98f, 0f)),  // cluster 0, dissimilar to both
      (20L, Seq(0.1f, 1f, 0f, 0f)),     // cluster 1
      (21L, Seq(0.1f, 1f, 0.001f, 0f))  // cluster 1, near-dup of 20
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.semanticDedupPairs(vecs, centroids, threshold = 0.95)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 11L), (20L, 21L)))
    val kept = Similarity.dropSemanticDups(vecs, centroids, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(10L, 12L, 20L))
    // degenerate-cluster guard: a cap below the cluster size drops its pairs
    assert(Similarity.semanticDedupPairs(vecs, centroids, threshold = 0.95,
      maxBucketSize = 2).count() == 1) // only cluster 1 (2 members) survives
  }

  test("semanticDedupCapStats: dropped mass accounts exactly for over-cap clusters") {
    val centroids = Seq(
      0 -> Seq(1f, 0f, 0f, 0f),
      1 -> Seq(0f, 1f, 0f, 0f))
    // cluster 0: 3 members; cluster 1: 2 members
    val vecs = Seq(
      (10L, Seq(1f, 0.1f, 0f, 0f)),
      (11L, Seq(0.9f, 0.12f, 0f, 0f)),
      (12L, Seq(0.95f, 0f, 0.1f, 0f)),
      (20L, Seq(0.1f, 1f, 0f, 0f)),
      (21L, Seq(0.1f, 1f, 0.001f, 0f))
    ).toDF("vec_id", "embedding")
    val noCap = Similarity.semanticDedupCapStats(vecs, centroids,
      maxBucketSize = 10000).head()
    assert(noCap.getLong(0) == 2 && noCap.getLong(1) == 0 &&
      noCap.getLong(2) == 0 && noCap.getLong(3) == 5, s"$noCap")
    // cap = 2 drops cluster 0 (3 members) — exactly the mass the pair
    // stage silently excludes, now measured
    val capped = Similarity.semanticDedupCapStats(vecs, centroids,
      maxBucketSize = 2).head()
    assert(capped.getLong(0) == 2 && capped.getLong(1) == 1 &&
      capped.getLong(2) == 3 && capped.getLong(3) == 5, s"$capped")
    // consistency with the operator: the dropped cluster contributes no
    // pairs, the surviving one still does
    assert(Similarity.semanticDedupPairs(vecs, centroids, threshold = 0.9,
      maxBucketSize = 2).select("bucket").distinct()
      .as[Int].collect().toSet == Set(1))
  }

  test("validateRecallGrid: rejects rows the power-law fit cannot price") {
    def g(rows: (Long, Seq[(Int, Double)])*): Seq[(Long, Seq[(Int, Double)])] = rows
    // the committed grids pass by construction (they are validated at
    // class init — this line also proves init didn't throw)
    assert(Similarity.nprobeFor(0.8, 2000L) == 3)
    intercept[IllegalArgumentException](          // empty grid
      Similarity.validateRecallGrid("t", Nil))
    intercept[IllegalArgumentException](          // single-entry row: gamma = x/log(1)
      Similarity.validateRecallGrid("t", g(100L -> Seq(3 -> 0.5))))
    intercept[IllegalArgumentException](          // non-monotone recall
      Similarity.validateRecallGrid("t", g(100L -> Seq(1 -> 0.6, 3 -> 0.5))))
    intercept[IllegalArgumentException](          // duplicate nprobe
      Similarity.validateRecallGrid("t", g(100L -> Seq(3 -> 0.5, 3 -> 0.6))))
    intercept[IllegalArgumentException](          // only 1 sub-1.0 entry: no fit
      Similarity.validateRecallGrid("t", g(100L -> Seq(1 -> 0.5, 3 -> 1.0))))
    intercept[IllegalArgumentException](          // 1.0 not in trailing position
      Similarity.validateRecallGrid("t",
        g(100L -> Seq(1 -> 0.5, 2 -> 1.0, 3 -> 1.0))))
    intercept[IllegalArgumentException](          // descending row sizes
      Similarity.validateRecallGrid("t", g(
        200L -> Seq(1 -> 0.5, 3 -> 0.6), 100L -> Seq(1 -> 0.5, 3 -> 0.6))))
    // round-16: a genuinely measured TRAILING saturated point is legal
    // (the mining 1× nprobe-16 row, 201/201) — direct lookup may hit it,
    // and the power-law fit must run over the sub-1.0 prefix only
    val sat = Similarity.validateRecallGrid("t",
      g(100L -> Seq(1 -> 0.5, 3 -> 0.75, 16 -> 1.0)))
    assert(Similarity.nprobeFromGrid(sat, 0.9, 100L) == 16,
      "a 0.9 target must resolve at the measured saturated point")
    assert(Similarity.nprobeForMining(0.99, 2000L) == 16,
      "the mining 1x row's measured 201/201 point serves near-1 targets")
  }

  test("miningPrecisionAt: measured companion to the recall operating point") {
    // the registered q160 point: (recall 0.925, precision 0.935) at 1x
    assert(math.abs(Similarity.miningPrecisionAt(8, 2000L) - 0.9347) < 1e-9)
    // pessimistic-by-scale row choice, round-DOWN within the row
    assert(math.abs(Similarity.miningPrecisionAt(9, 60000L) - 0.6865) < 1e-9)
    // beyond the largest measured row the largest answers
    assert(Similarity.miningPrecisionAt(16, Long.MaxValue) ==
      Similarity.miningDecisionGrid.last._2.find(_._1 == 16).get._3)
    // below the smallest measured probe the smallest answers
    assert(math.abs(Similarity.miningPrecisionAt(1, 2000L) - 0.4057) < 1e-9)
  }

  test("snapshot-based incremental admission equals the direct window form") {
    // 60 vectors in two loose clusters + exact-duplicate spikes so both
    // rejection and the degenerate-bucket cap paths exercise
    val base = (0L until 60L).map { i =>
      val b = if (i % 2 == 0) ax else ay
      (i, vec(b, 0.3f, i.toInt))
    }
    val spikes = (100L until 110L).map(i => (i, ax.toSeq)) // identical vectors
    val all = (base ++ spikes).toDF("vec_id", "embedding")
    val hist = all.filter(col("vec_id") % 5 =!= 0)
    val batch = all.filter(col("vec_id") % 5 === 0)
    for (cap <- Seq(10000, 8); th <- Seq(0.9, 0.35)) {
      val direct = Similarity.incrementalCosineDedupBatch(hist, batch,
        threshold = th, planes = 64, bands = 8, maxBucketSize = cap)
        .select("vec_id").as[Long].collect().toSet
      val snap = Similarity.cosineBandSnapshot(hist, planes = 64, bands = 8)
      val viaSnap = Similarity.incrementalCosineDedupAgainstSnapshot(
        hist, snap, batch, threshold = th, planes = 64, maxBucketSize = cap)
        .select("vec_id").as[Long].collect().toSet
      assert(viaSnap == direct, s"cap=$cap th=$th")
    }
  }

  test("IVF recall audit: full probing scores 1.0, starved probing below") {
    val cents = Seq(0 -> ax.toSeq, 1 -> ay.toSeq)
    val bucketed = Similarity.assignBuckets(embeddings, cents)
    val queries = embeddings.filter(col("vec_id").isin(0L, 5L))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    // probing every list recovers the exact top-k: recall 1.0 per query
    val full = Similarity.ivfBatchRecallAudit(bucketed, cents, queries,
        k = 4, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(full.length == 2 && full.forall(t => t._2 == 4L && t._3 == 1.0))
    // nprobe=1 starves the cross-cluster tail of each top-4 (cluster
    // sizes are 5, so the 4 nearest same-cluster vectors survive; the
    // audit must agree with a hand computation, not just be < 1)
    val one = Similarity.ivfBatchRecallAudit(bucketed, cents, queries,
        k = 6, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(one.values.forall(r => r > 0.0 && r < 1.0),
      s"6-deep top-k must lose its cross-cluster tail at nprobe=1: $one")
    // k larger than the corpus: the denominator is the exact result
    // size, so a full-probing search still scores recall 1.0
    val over = Similarity.ivfBatchRecallAudit(bucketed, cents, queries,
        k = 50, nprobe = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(over.forall(t => t._1 == 11L && t._2 == 1.0),
      s"oversized k must not understate recall: ${over.toSeq}")
  }

  test("sampled recall audit: md5 subset of the full audit, rows intact") {
    val cents = Seq(0 -> ax.toSeq, 1 -> ay.toSeq)
    val bucketed = Similarity.assignBuckets(embeddings, cents)
    val queries = embeddings
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val full = Similarity.ivfBatchRecallAudit(bucketed, cents, queries,
        k = 4, nprobe = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .toMap
    val rate = 0.5
    val sampled = Similarity.ivfBatchRecallAudit(bucketed, cents, queries,
        k = 4, nprobe = 2, sampleRate = rate)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .toMap
    // the sample is exactly the md5-uniform keep set — deterministic,
    // and each audited query's recall is IDENTICAL to the full audit's
    // (sampling selects queries, it never perturbs a query's result)
    val expected = queries.select(col("query_id"))
      .filter(Sampling.uniformHash(col("query_id"), "recall") < rate)
      .as[Long].collect().toSet
    assert(sampled.keySet == expected,
      s"sampled=${sampled.keySet} expected=$expected")
    assert(expected.nonEmpty && expected.size < full.size,
      s"fixture must make the sample a strict nonempty subset: $expected")
    assert(sampled.forall { case (q, v) => full(q) == v })
    // rate 1.0 short-circuits to the full audit
    val all = Similarity.ivfBatchRecallAudit(bucketed, cents, queries,
        k = 4, nprobe = 2, sampleRate = 1.0)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .toMap
    assert(all == full)
    // maxProbes: the FIXED audit budget — exactly the `n` queries with
    // the smallest md5 uniform (ties by id), results untouched
    val budget = 3
    val capped = Similarity.ivfBatchRecallAudit(bucketed, cents, queries,
        k = 4, nprobe = 2, maxProbes = budget)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .toMap
    val ranked = queries
      .select(col("query_id"),
        Sampling.uniformHash(col("query_id"), "recall").as("u"))
      .orderBy(col("u").asc, col("query_id").asc)
      .limit(budget).select("query_id").as[Long].collect().toSet
    assert(ranked.size == budget)
    assert(capped.keySet == ranked, s"capped=${capped.keySet} want=$ranked")
    assert(capped.forall { case (q, v) => full(q) == v })
  }

  test("bands=0 auto-derivation refuses non-64-bit signatures") {
    intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairs(embeddings, threshold = 0.9, planes = 32)
    }
  }

  test("ingest-time embedding admission: snapshot scrub runs per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // frozen history + its materialized band snapshot — the deployment
    // shape: the snapshot is built once per corpus publish, each arriving
    // micro-batch is scrubbed against it via foreachBatch
    val hist = (0L until 10L).map(i => (i * 2 + 1, vec(ax, 0.02f, i.toInt)))
      .toDF("vec_id", "embedding")
    val snap = Similarity.cosineBandSnapshot(hist, planes = 64, bands = 8)
    val input = MemoryStream[(Long, Seq[Float])]
    val admitted = scala.collection.mutable.ArrayBuffer[Long]()
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ok = Similarity.incrementalCosineDedupAgainstSnapshot(
          hist, snap, batch, threshold = 0.9, planes = 64)
        admitted.synchronized {
          admitted ++= ok.select("vec_id").as[Long].collect().sorted
        }
        ()
      }.start()
    try {
      input.addData(
        (100L, vec(ax, 0.01f, 3)), // history echo → rejected
        (102L, vec(ay, 0.01f, 7))) // novel direction → admitted
      q.processAllAvailable()
      // batch-internal dedup also applies per micro-batch
      input.addData(
        (200L, vec(ay, 0.015f, 9)),  // novel vs history → admitted
        (201L, vec(ay, 0.015f, 9)))  // echo of 200 in the same batch → rejected
      q.processAllAvailable()
      assert(admitted.synchronized(admitted.toList) == List(102L, 200L))
    } finally q.stop()
  }

  test("auto-banded snapshot admission: streaming micro-batches equal the direct form, width derived once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // production refresh-loop shape under the bands = 0 sizing: the
    // snapshot is built ONCE with the width derived from the known
    // population (n threaded — the count is never re-run per batch), and
    // the scrubber re-derives that width from the snapshot's band column
    // on every micro-batch. Decisions must equal the direct window form
    // run on the same (history, chunk) pairs.
    val hist = (0L until 12L).map(i => (i * 2 + 1, vec(ax, 0.02f, i.toInt)))
      .toDF("vec_id", "embedding").cache()
    val chunks = Seq(
      Seq((100L, vec(ax, 0.01f, 3)),   // history echo → rejected
          (102L, vec(ay, 0.01f, 7))),  // novel direction → admitted
      Seq((200L, vec(ay, 0.015f, 9)),  // novel vs history → admitted
          (201L, vec(ay, 0.015f, 9)))) // echo of 200, same batch → rejected
    val population = 12L + chunks.map(_.size).sum
    val snap = Similarity.cosineBandSnapshot(hist, planes = 64, bands = 0,
      n = population).cache()
    val streamed = scala.collection.mutable.ArrayBuffer[Long]()
    val input = MemoryStream[(Long, Seq[Float])]
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // bands default 0: width read back from the snapshot, no recount
        val ok = Similarity.incrementalCosineDedupAgainstSnapshot(
          hist, snap, batch, threshold = 0.9, planes = 64)
        streamed.synchronized {
          streamed ++= ok.select("vec_id").as[Long].collect().sorted
        }
        ()
      }.start()
    try {
      chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
    } finally q.stop()
    // batch replay: the direct form per chunk with the SAME pinned
    // population — the equality the q139/q140 oracles rely on
    val direct = chunks.flatMap { c =>
      Similarity.incrementalCosineDedupBatch(
        hist, c.toDF("vec_id", "embedding"), threshold = 0.9, planes = 64,
        bands = 0, n = population)
        .select("vec_id").as[Long].collect().sorted
    }
    assert(streamed.synchronized(streamed.toList) == direct.toList)
    assert(direct.toList == List(102L, 200L))
  }

  test("snapshot admission equals the direct form on randomized corpora") {
    // seeded random trials across corpus shapes, caps, and thresholds —
    // the fixed-fixture equivalence test's adversarial sibling
    val rng = new scala.util.Random(4242)
    for (trial <- 1 to 6) {
      val n = 30 + rng.nextInt(60)
      val dim = 8
      val rows = (0 until n).map { i =>
        // mixture of two directions + noise, plus occasional exact dups
        val base = if (rng.nextBoolean()) Array.fill(dim)(0f).updated(0, 1f)
          else Array.fill(dim)(0f).updated(1, 1f)
        val v = if (rng.nextInt(5) == 0 && i > 0) {
          // duplicate an earlier direction exactly
          base.toSeq
        } else base.map(x => x + (rng.nextFloat() - 0.5f) * 0.4f).toSeq
        (i.toLong, v)
      }
      val all = rows.toDF("vec_id", "embedding")
      val hist = all.filter(col("vec_id") % 3 =!= 0)
      val batch = all.filter(col("vec_id") % 3 === 0)
      val cap = Seq(10000, 6)(rng.nextInt(2))
      val th = Seq(0.98, 0.6)(rng.nextInt(2))
      val direct = Similarity.incrementalCosineDedupBatch(hist, batch,
        threshold = th, planes = 64, bands = 8, maxBucketSize = cap)
        .select("vec_id").as[Long].collect().toSet
      val snap = Similarity.cosineBandSnapshot(hist, planes = 64, bands = 8)
      val viaSnap = Similarity.incrementalCosineDedupAgainstSnapshot(
        hist, snap, batch, threshold = th, planes = 64,
        maxBucketSize = cap, bands = 8)
        .select("vec_id").as[Long].collect().toSet
      assert(viaSnap == direct, s"trial=$trial n=$n cap=$cap th=$th")
    }
  }

  test("indexParams derives nlist ~ sqrt(N) and band width >= log2(N)") {
    // nlist = ceil(sqrt(N)), capped
    assert(Similarity.indexParams(0).nlist == 1)
    assert(Similarity.indexParams(100).nlist == 10)
    assert(Similarity.indexParams(150000).nlist == 388)
    assert(Similarity.indexParams(1L << 40).nlist == 65536) // cap
    // band width: 4x16 to 2^16, 2x32 to 2^32, 1x64 beyond
    assert(Similarity.indexParams(5000) == Similarity.IndexParams(71, 64, 4))
    assert(Similarity.indexParams(1L << 16).bands == 4)
    assert(Similarity.indexParams((1L << 16) + 1).bands == 2)
    val at150k = Similarity.indexParams(150000)
    assert(at150k.bands == 2 && at150k.perBand == 32)
    assert(Similarity.indexParams(1L << 32).bands == 2)
    assert(Similarity.indexParams((1L << 32) + 1).bands == 1)
    // every derived width keeps 2^perBand >= N (up to the 64-bit word)
    for (n <- Seq(10L, 1000L, 100000L, 10000000L)) {
      val p = Similarity.indexParams(n)
      assert(p.perBand >= 16 && BigInt(2).pow(p.perBand) >= n)
      assert(p.bands * p.perBand == p.planes)
    }
  }

  test("kernel assignment path agrees bit-for-bit with the literal-struct argmax") {
    // >16 centroids forces the NearestCentroidsF kernel; compare against
    // the literal-struct array_max form run on the same centroid list
    val r = new scala.util.Random(7)
    val cents = (0 until 20).map(i =>
      i -> Seq.fill(4)(r.nextFloat() * 2 - 1))
    val viaKernel = Similarity.assignBuckets(embeddings, cents)
      .select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    val scored = cents.map { case (cid, cvec) =>
      struct(Similarity.cosine(col("embedding"),
        array(cvec.map(lit): _*)).as("sim"), lit(cid).as("cid"))
    }
    val viaLiteral = embeddings
      .withColumn("bucket", array_max(array(scored: _*)).getField("cid"))
      .select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    assert(viaKernel == viaLiteral)
    // probe selection (ties smaller, rank order): top-3 must equal a
    // local argsort of the same cosines
    val probes = embeddings.select(col("vec_id"),
        graft.functions.native.nearestCentroidsF(col("embedding"),
          cents.flatMap(_._2), cents.size, 3, tiesLarger = false).as("pb"))
      .as[(Long, Seq[Int])].collect().toMap
    def cosL(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val n = math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum)
      if (n == 0) 0.0 else d / n
    }
    for ((id, v) <- embeddings.as[(Long, Seq[Float])].collect()) {
      val want = cents.map { case (cid, cv) => (cid, cosL(v, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }.take(3).map(_._1)
      assert(probes(id) == want, s"probe list mismatch for vec $id")
    }
  }

  test("writeIvfIndexAuto builds a partition-pruned index probes reproduce exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-auto").toString
    val cents = Similarity.writeIvfIndexAuto(embeddings, dir, iters = 1)
    assert(cents.size == Similarity.indexParams(11).nlist)
    val q = Seq(1f, 0f, 0f, 0f)
    val idx = Similarity.ivfTopKIndexed(spark, dir, cents, q, k = 3,
      nprobe = cents.size)
    val mem = Similarity.ivfTopK(Similarity.assignBuckets(embeddings, cents),
      cents, q, k = 3, nprobe = cents.size)
    assert(idx.collect().toSeq == mem.collect().toSeq)
  }

  test("bands=1 (one 64-bit band) round-trips: exact duplicates still collide") {
    // long-shift-wrap regression: (1L << 64) - 1 == 0, so the bands=1
    // layout indexParams derives for N > 2^32 used to mask every band
    // key to (0, 0) — one over-cap bucket, silently zero candidates.
    // With a tight cap, only the true full-signature collisions survive.
    // identical vectors on a direction no cluster crowds (so their
    // full-signature bucket stays within the tight cap)
    val az = Seq(0f, 0f, 0f, 1f)
    val dups = Seq((200L, az), (201L, az))
    val all = embeddings.unionByName(dups.toDF("vec_id", "embedding"))
    val pairs = Similarity.cosineNearDupPairs(all, threshold = 0.99,
      planes = 64, bands = 1, maxBucketSize = 5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((200L, 201L)),
      s"identical vectors must share their full 64-bit band key: $pairs")
    // and the incremental form under bands=1 still rejects an exact echo
    val admitted = Similarity.incrementalCosineDedupBatch(
      Seq((1L, ax.toSeq)).toDF("vec_id", "embedding"),
      Seq((300L, ax.toSeq), (301L, ay.toSeq)).toDF("vec_id", "embedding"),
      threshold = 0.99, planes = 64, bands = 1, maxBucketSize = 5)
      .select("vec_id").as[Long].collect().toSet
    assert(admitted == Set(301L),
      s"bands=1 must reject the exact history echo, admit the novel: $admitted")
  }

  test("snapshot admission does not self-reject an id present in both sides") {
    // the direct form's pid =!= bid guard must hold on the snapshot path
    // too: an id in BOTH history and batch otherwise rejects itself via
    // a cosine-1 self-pair and the two forms diverge
    val hist = Seq((7L, ax.toSeq)).toDF("vec_id", "embedding")
    val batch = Seq((7L, ax.toSeq), (9L, ay.toSeq)).toDF("vec_id", "embedding")
    val direct = Similarity.incrementalCosineDedupBatch(hist, batch,
      threshold = 0.9, planes = 64, bands = 4)
      .select("vec_id").as[Long].collect().toSet
    val snap = Similarity.cosineBandSnapshot(hist, planes = 64, bands = 4)
    val viaSnap = Similarity.incrementalCosineDedupAgainstSnapshot(
      hist, snap, batch, threshold = 0.9, planes = 64, bands = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(direct == Set(7L, 9L), s"direct form must not self-reject: $direct")
    assert(viaSnap == direct, s"snapshot=$viaSnap direct=$direct")
  }

  test("NaN vectors: kernel and literal-struct assignment agree (largest cid)") {
    // a NaN component makes every centroid sim NaN; struct-max orders NaN
    // greatest and ties to the larger cid, so BOTH physical forms must
    // assign the largest cid (the kernel used to fall back to cid 0)
    val withNaN = embeddings.unionByName(
      Seq((99L, Seq(Float.NaN, 0f, 0f, 0f))).toDF("vec_id", "embedding"))
    val cents = Seq(0 -> ax.toSeq, 1 -> ay.toSeq, 2 -> Seq(0f, 0f, 1f, 0f))
    val literal = Similarity.assignBuckets(withNaN, cents) // <=16: array_max
      .select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    val kernel = withNaN.select(col("vec_id"),
        element_at(graft.functions.native.nearestCentroidsF(col("embedding"),
          cents.flatMap(_._2), cents.size, 1, tiesLarger = true), 1).as("bucket"))
      .as[(Long, Int)].collect().toMap
    assert(kernel == literal, s"kernel=$kernel literal=$literal")
    assert(literal(99L) == 2, s"NaN row must take the largest cid: ${literal(99L)}")
  }

  test("broadcast-join assignment agrees with both in-plan forms (incl. NaN rows)") {
    val withNaN = embeddings.unionByName(
      Seq((99L, Seq(Float.NaN, 0f, 0f, 0f))).toDF("vec_id", "embedding"))
    // literal-struct regime (≤ 16 lists) and kernel regime (> 16) both
    // compared against the join path on the same inputs
    val few = Seq(0 -> ax.toSeq, 1 -> ay.toSeq, 2 -> Seq(0f, 0f, 1f, 0f))
    val many = (0 until 17).map(i =>
      i -> vec(if (i % 2 == 0) ax else ay, 0.3f, 1000 + i))
    for (cents <- Seq(few, many)) {
      val inPlan = Similarity.assignBuckets(withNaN, cents)
        .select("vec_id", "bucket").as[(Long, Int)].collect().toMap
      val centTable = cents.toDF("cid", "centroid")
      val joined = Similarity.assignBucketsJoin(withNaN, centTable)
        .as[(Long, Int)].collect().toMap
      assert(joined == inPlan,
        s"nlist=${cents.size}: join=$joined inPlan=$inPlan")
      // NaN vector must land on the largest cid in every physical form
      assert(joined(99L) == cents.size - 1)
    }
  }

  test("margin mining: aligned cross-side pair mined, weak pair rejected") {
    // 4 vectors, nlist = ceil(sqrt(4)) = 2, centroids = ids 0/1:
    // id0 -> bucket 0 (alone, no target side -> contributes nothing);
    // id1(tgt), id2(src), id3(tgt) -> bucket 1. Cross pairs there:
    // (2,3) cos = 0.9/sqrt(0.82) ~ 0.9939 -> margin 1.29 (mined);
    // (2,1) cos ~ 0.11 -> margin 0.33 (rejected).
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0),
      (1L, Seq(0.9f, 0.1f, 0f, 0f), 1),
      (2L, Seq(0f, 1f, 0f, 0f), 0),
      (3L, Seq(0f, 0.9f, 0.1f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.marginMinedPairs(emb, srcLabel = 0, tgtLabel = 1)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.length == 1, s"expected one mined pair, got ${got.toSeq}")
    val (src, tgt, cos, margin) = got.head
    assert(src == 2L && tgt == 3L)
    // cos is the 6dp-fixed integer divided back out — recompute the
    // fixed-point value locally from the same float inputs
    val raw = 0.9f.toDouble * 1.0 /
      (1.0 * math.sqrt(0.9f.toDouble * 0.9f.toDouble + 0.1f.toDouble * 0.1f.toDouble))
    assert(cos == math.round(raw * 1e6).toDouble / 1e6, s"cos=$cos raw=$raw")
    assert(margin > 1.02 && margin < 2.0, s"margin=$margin")
    // deterministic
    val again = Similarity.marginMinedPairs(emb, srcLabel = 0, tgtLabel = 1)
      .as[(Long, Long, Double, Double)].collect()
    assert(again.toSeq == got.toSeq)
    // a label with no members mines nothing
    assert(Similarity.marginMinedPairs(emb, srcLabel = 0, tgtLabel = 7)
      .count() == 0)
  }

  test("margin mining demotes hubs relative to true pairs") {
    // nlist = ceil(sqrt(7)) = 3, seeded from ids 0..2: id0 anchors the
    // cluster of interest, ids 1/2 are orthogonal junk axes that soak up
    // the other two centroids (each alone in its bucket -> no pairs).
    // Inside bucket 0: source x has a true match y1 (cos .99, and y1 is
    // FAR from the spare sources) and a hub target yh (cos ~.8 to x AND
    // to both spares). The margin must rank (x, y1) above every
    // hub-mediated pair even though yh's raw cosines are respectable.
    val emb = Seq(
      (0L, Seq(0.8f, 0.6f, 0f, 0f), 0),        // x (also centroid 0)
      (1L, Seq(0f, 1f, 0f, 0f), 0),            // junk axis -> own bucket
      (2L, Seq(0f, 0f, 1f, 0f), 0),            // junk axis -> own bucket
      (3L, Seq(0.88f, 0.475f, 0f, 0f), 1),     // y1: close to x only
      (4L, Seq(0.8f, 0f, 0.05f, 0.05f), 1),    // yh: ~.8 to x AND spares
      (5L, Seq(0.8f, -0.58f, 0.1f, 0f), 0),    // spare sources whose only
      (6L, Seq(0.8f, -0.58f, 0f, 0.1f), 0)     // good target is the hub
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.marginMinedPairs(emb, srcLabel = 0, tgtLabel = 1,
        threshold = 0.0)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._4)).toMap
    assert(got.contains(0L), s"source x mined nothing: $got")
    val (xBest, xMargin) = got(0L)
    assert(xBest == 3L, s"x's forward-best must be the true match: $got")
    assert(xMargin > 1.02, s"true pair under the default threshold: $got")
    for (spare <- Seq(5L, 6L)) {
      val (t, m) = got(spare)
      assert(t == 4L, s"spare $spare's best candidate is the hub: $got")
      assert(xMargin > m,
        s"true pair ($xMargin) must outrank hub pair of $spare ($m)")
    }
  }

  test("kNN label propagation: majority vote, cosine tie-break, no-seed clusters excluded") {
    // nlist = ceil(sqrt(8)) = 3, centroids = ids 0..2 (three axes).
    // Cluster 0: seeds labeled 7,7,8 + one target -> majority 7.
    // Cluster 1: seeds labeled 5 (id1) and 9 (id7, off-axis) + two
    //   targets that split 1-1 between them -> the BEST-COSINE tie-break
    //   decides, not the smaller label.
    // Cluster 2: target id2 alone, no seed -> NO row (auditable).
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 7),
      (1L, Seq(0f, 1f, 0f, 0f), 5),
      (2L, Seq(0f, 0f, 1f, 0f), 0),
      (3L, Seq(0.95f, 0.05f, 0f, 0f), 7),
      (4L, Seq(0.9f, 0.1f, 0f, 0f), 8),
      (5L, Seq(0.97f, 0.03f, 0f, 0f), 0),
      (6L, Seq(0f, 0.95f, 0.05f, 0f), 0),
      (7L, Seq(0f, 0.9f, 0.1f, 0f), 9),
      (8L, Seq(0f, 0.92f, 0.08f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.knnLabelPropagation(emb,
        isSeed = col("vec_id").isin(0L, 1L, 3L, 4L, 7L))
      .as[(Long, Int, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(!got.contains(2L), s"no-seed cluster must emit no row: $got")
    assert(got(5L) == ((7, 2L, 3L)), s"majority of {7,7,8}: ${got(5L)}")
    // id6 is nearer the label-5 seed; id8 is nearer the label-9 seed —
    // both are 1-1 vote ties resolved by best cosine
    assert(got(6L)._1 == 5 && got(6L)._2 == 1L && got(6L)._3 == 2L,
      s"tie toward the closer label-5 seed: ${got(6L)}")
    assert(got(8L)._1 == 9, s"tie toward the closer label-9 seed " +
      s"(NOT the smaller label): ${got(8L)}")
  }

  test("margin mining and label propagation are partitioning-invariant") {
    // the determinism contract behind the hash-exact oracles: every cut
    // (kNN rank, vote winner, forward-best) carries a full tie-break, so
    // physical row order must not leak into results. Perturb the layout
    // hard (odd partition count + a shuffling repartition) and demand
    // bit-identical output.
    val emb = (0L until 40L).map(i =>
      (i, vec(if (i % 2 == 0) ax else ay, 0.4f, 7000 + i.toInt),
        (i % 3).toInt)).toDF("vec_id", "embedding", "label")
    val shuffled = emb.repartition(7, col("label"))
    val m1 = Similarity.marginMinedPairs(emb, 0, 1, threshold = 0.0)
      .collect().map(_.toSeq).toSet
    val m2 = Similarity.marginMinedPairs(shuffled, 0, 1, threshold = 0.0)
      .collect().map(_.toSeq).toSet
    assert(m1 == m2 && m1.nonEmpty, s"mined set depends on layout")
    val l1 = Similarity.knnLabelPropagation(emb,
        isSeed = col("vec_id") % 3 === 0)
      .collect().map(_.toSeq).toSet
    val l2 = Similarity.knnLabelPropagation(shuffled,
        isSeed = col("vec_id") % 3 === 0)
      .collect().map(_.toSeq).toSet
    assert(l1 == l2 && l1.nonEmpty, s"label set depends on layout")
  }

  test("autoCentroids builds a sqrt(N) quantizer the batch probe can use") {
    val cents = Similarity.autoCentroids(embeddings, iters = 1)
    assert(cents.size == Similarity.indexParams(11).nlist) // ceil(sqrt(11)) = 4
    assert(cents.map(_._1) == cents.indices)
    val bucketed = Similarity.assignBuckets(embeddings, cents)
    val queries = embeddings.limit(2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val got = Similarity.ivfTopKBatch(bucketed, cents, queries, k = 3,
      nprobe = cents.size) // all probes => exact
      .as[(Long, Long)].collect().toSet
    val brute = queries.as[(Long, Seq[Float])].collect().flatMap {
      case (qid, qv) =>
        Similarity.bruteForceTopK(embeddings, qv, 3)
          .select("vec_id").as[Long].collect().map(qid -> _)
    }.toSet
    assert(got == brute)
  }

  test("exact-Lloyd k-means: local-arithmetic mirror, partitioning " +
      "invariance, empty-bucket carry") {
    // fixed6 is SQL ROUND (half AWAY from zero) — math.round would round
    // -x.5 toward +inf and silently diverge from the oracle. v·10⁶ is
    // ALWAYS exact in double (24-bit float mantissa × 2²⁰ < 2⁵³), and
    // ±1/128 lands exactly on ∓7812.5 — a representable half case
    import graft.functions.VectorFixedSumAggregator.fixed6
    assert(fixed6(-1f / 128) == -7813L && fixed6(1f / 128) == 7813L)
    assert(fixed6(-1.0f) == -1000000L)
    // one Lloyd round mirrored locally with the same fixed-point math
    val got = Similarity.kmeansCentroidsExact(embeddings, k = 2, iters = 1)
    val seed = Similarity.sampleCentroids(embeddings, 2)
    val asg = Similarity.assignBuckets(embeddings, seed)
      .select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    val vecs = embeddings.as[(Long, Seq[Float])].collect().toMap
    val expected = seed.map { case (cid, old) =>
      val members = vecs.filter { case (id, _) => asg(id) == cid }.values
      if (members.isEmpty) (cid, old)
      else {
        val dim = members.head.length
        val sums = Array.fill(dim)(0L)
        members.foreach(v => (0 until dim).foreach(i => sums(i) += fixed6(v(i))))
        (cid, sums.map(s => ((s.toDouble / members.size) / 1e6).toFloat).toSeq)
      }
    }
    assert(got == expected, s"got=$got expected=$expected")
    // bit-identical under any input partitioning (integer sums commute)
    val reparted = Similarity.kmeansCentroidsExact(
      embeddings.repartition(7, col("vec_id")), k = 2, iters = 1)
    assert(reparted == got)
    // a bucket that captures nothing keeps its seed centroid verbatim:
    // duplicate seeds (ids 0/1 identical) tie every assignment to the
    // LARGER cid, so bucket 0 starves and must carry its seed unchanged
    val dup = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(0.9f, 0.1f, 0f, 0f))).toDF("vec_id", "embedding")
    val carried = Similarity.kmeansCentroidsExact(dup, k = 2, iters = 1)
    assert(carried.head == (0, Seq(1f, 0f, 0f, 0f)),
      s"starved bucket must keep its seed: $carried")
    assert(carried(1)._2 != Seq(1f, 0f, 0f, 0f), // bucket 1 really moved
      s"winning bucket must take the member mean: $carried")
  }

  test("assignBucketsAuto flips physical form at the literal ceiling") {
    val cents = (0 until 5).map(i =>
      i -> vec(if (i % 2 == 0) ax else ay, 0.3f, 2000 + i))
    // ceiling 5: in-plan form (no join); ceiling 4: broadcast-join form
    val inPlan = Similarity.assignBucketsAuto(embeddings, cents,
      literalCeiling = 5)
    val viaJoin = Similarity.assignBucketsAuto(embeddings, cents,
      literalCeiling = 4)
    def joins(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Join"))
    assert(joins(inPlan) == 0, "literal regime must not add joins")
    assert(joins(viaJoin) > 0, "over-ceiling regime must take the join path")
    // identical assignments either side of the flip, same output shape
    val a = inPlan.select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    val b = viaJoin.select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    assert(a == b, s"inPlan=$a viaJoin=$b")
    assert(inPlan.columns.toSeq.sorted == viaJoin.columns.toSeq.sorted)
    // the default ceiling is the documented indexParams nlist cap
    assert(Similarity.maxLiteralNlist == 65536)
  }

  test("multi-probe label propagation: nprobe=1 identical, nprobe=2 " +
      "recovers a cross-cluster seed") {
    // 9 vectors -> nlist = 3, centroids = ids 0/1/2 (x-axis at 0°,
    // y-axis at 90°, diagonal at 45°). The ax/diag cluster boundary is
    // 22.5°: target 8 sits at 25° (home = diag cluster, whose only seed
    // is the 45° centroid), while its TRUE nearest seed 3 sits at 20°,
    // one cluster over in the ax cluster — exactly the boundary case
    // single-probe bounding misses and a second probe recovers.
    val diag = Seq(0.7071f, 0.7071f, 0f, 0f)
    val emb = Seq(
      (0L, ax.toSeq, 0), (1L, ay.toSeq, 1), (2L, diag, 2),
      (3L, Seq(0.9397f, 0.3420f, 0f, 0f), 0), // 20°: 8's true 1-NN, home ax
      (4L, Seq(0.1f, 0.995f, 0f, 0f), 1),
      (5L, Seq(0f, 0.1f, 0.99f, 0f), 2),
      (6L, Seq(0.05f, 0.9f, 0.3f, 0f), 1),
      (7L, Seq(0.9f, 0.1f, 0.4f, 0f), 0),
      (8L, Seq(0.9063f, 0.4226f, 0f, 0f), 9)  // 25°: the target
    ).toDF("vec_id", "embedding", "label")
    val seedCond = col("vec_id") < 8
    val single = Similarity.knnLabelPropagation(emb, seedCond, k = 1)
      .as[(Long, Int, Long, Long)].collect().toSeq
    val singleExplicit = Similarity.knnLabelPropagation(emb, seedCond,
      k = 1, nprobe = 1).as[(Long, Int, Long, Long)].collect().toSeq
    assert(single == singleExplicit, "nprobe=1 must be the default path")
    val multi = Similarity.knnLabelPropagation(emb, seedCond, k = 1,
      nprobe = 2).as[(Long, Int, Long, Long)].collect().toSeq
    // audit the fixture's premise, then the mitigation: single-probe
    // finds a same-cluster seed but NOT the true 1-NN; nprobe=2 does
    val cents = Similarity.sampleCentroids(emb, Similarity.indexParams(9).nlist)
    val home = Similarity.assignBuckets(emb, cents)
      .select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    assert(home(8L) != home(3L), "fixture: true 1-NN must be cross-cluster")
    assert(single.nonEmpty && multi.nonEmpty)
    val s8 = single.find(_._1 == 8L).get
    val m8 = multi.find(_._1 == 8L).get
    assert(s8._2 != 0, s"single-probe should miss the x-axis seed: $s8")
    assert(m8._2 == 0, s"nprobe=2 must recover seed 3's label: $m8")
    // the recall audit prices exactly that gap, and multi-probe closes it
    val r1 = Similarity.knnPropagationRecallAudit(emb, seedCond, k = 1)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val r2 = Similarity.knnPropagationRecallAudit(emb, seedCond, k = 1,
      nprobe = 2).as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(r1(8L) == 0.0, s"single-probe recall@1 of target 8: $r1")
    assert(r2(8L) == 1.0, s"multi-probe recall@1 of target 8: $r2")
  }

  test("ingest-form labeling: micro-batch composable, agrees with the " +
      "whole-corpus form when the seed index coincides") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // seeds = ids 0..5 (so the smallest-id quantizer sample is all-seed:
    // the whole-corpus form derives the SAME centroids as the seed-index
    // form and their decisions must coincide on these targets)
    val seeds = (0L until 6L).map(i =>
      (i, vec(if (i % 2 == 0) ax else ay, 0.1f, i.toInt), (i % 2).toInt))
      .toDF("vec_id", "embedding", "label")
    val targets = Seq(
      (100L, vec(ax, 0.05f, 50), 9),
      (101L, vec(ay, 0.05f, 51), 9),
      (102L, vec(ax, 0.08f, 52), 9)
    ).toDF("vec_id", "embedding", "label")
    val nlist = Similarity.indexParams(9).nlist // 3: sample = seed ids 0..2
    val cents = Similarity.sampleCentroids(seeds, nlist)
    val ingest = Similarity.knnLabelsAgainstSeeds(seeds, targets, cents, k = 3)
      .collect().map(_.toSeq).toSet
    // whole-corpus form on seeds ∪ targets: same smallest-id centroids
    // (all targets have larger ids), cap not binding → same decisions
    val whole = Similarity.knnLabelPropagation(
        seeds.unionByName(targets), isSeed = col("vec_id") < 6, k = 3)
      .collect().map(_.toSeq).toSet
    assert(ingest == whole && ingest.nonEmpty, s"ingest=$ingest whole=$whole")
    // micro-batch composability: labeling two slices separately equals
    // labeling their union (per-target decisions read only the seed index)
    val b1 = targets.filter(col("vec_id") < 102)
    val b2 = targets.filter(col("vec_id") >= 102)
    val split =
      Similarity.knnLabelsAgainstSeeds(seeds, b1, cents, k = 3)
        .collect().map(_.toSeq).toSet ++
      Similarity.knnLabelsAgainstSeeds(seeds, b2, cents, k = 3)
        .collect().map(_.toSeq).toSet
    assert(split == ingest, s"split=$split union=$ingest")
    // streaming: foreachBatch labels each arriving micro-batch against
    // the frozen seed index; the sink accumulates the same predictions
    val input = MemoryStream[(Long, Seq[Float], Int)]
    val out = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ingest-ck").toString
    val q = Similarity.streamingKnnLabelIngest(
      input.toDF().toDF("vec_id", "embedding", "label"),
      seeds, cents, out, ckpt, k = 3)
    try {
      input.addData((100L, vec(ax, 0.05f, 50), 9), (101L, vec(ay, 0.05f, 51), 9))
      q.processAllAvailable()
      input.addData((102L, vec(ax, 0.08f, 52), 9))
      q.processAllAvailable()
      val table = spark.read.parquet(out)
      val streamed = table.drop("batch_id").collect().map(_.toSeq).toSet
      assert(streamed == ingest, s"streamed=$streamed batch=$ingest")
      // the sink is batchId-partitioned so an at-least-once REPLAY of a
      // micro-batch (foreachBatch's failure contract) overwrites its own
      // partition instead of appending duplicates: re-running batch 1's
      // body verbatim must leave the accumulated table unchanged
      assert(table.select("batch_id").distinct().as[Long].collect().toSet
        == Set(0L, 1L), "one partition per micro-batch")
      Similarity.knnLabelsAgainstSeeds(seeds,
          targets.filter(col("vec_id") >= 102), cents, k = 3)
        .withColumn("batch_id", lit(1L))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out)
      val replayed = spark.read.parquet(out).drop("batch_id")
        .collect().map(_.toSeq).toSet
      assert(replayed == ingest, s"replay must be idempotent: $replayed")
    } finally q.stop()
  }

  test("nprobeFor: smallest measured nprobe meeting the target, pessimistic by scale") {
    // grid lookups at the 1× audited scale (2000 vectors)
    assert(Similarity.nprobeFor(0.5, 2000L) == 1)  // 0.588 >= 0.5
    assert(Similarity.nprobeFor(0.8, 2000L) == 3)  // 0.834 >= 0.8 — q157's derived constant
    assert(Similarity.nprobeFor(0.9, 2000L) == 8)  // 0.923 >= 0.9
    // smaller corpora answer from the smallest measured row
    assert(Similarity.nprobeFor(0.8, 500L) == 3)
    // pessimistic: scale rounds UP to the next measured row (recall
    // falls with corpus size at the derived sizing)
    assert(Similarity.nprobeFor(0.5, 10000L) == 3)   // 60k row: 0.529
    assert(Similarity.nprobeFor(0.5, 100000L) == 8)  // 200k row: 0.603
    // the round-16 1M anchor row answers 1M-scale questions directly
    // (0.44 used to be a beyond-grid answer from the 200k row: np 3 at
    // 0.441; at the measured 1M geometry that misses — np 8 at 0.475)
    assert(Similarity.nprobeFor(0.44, 1000000L) == 8)
    // beyond the largest measured row, the largest row answers
    assert(Similarity.nprobeFor(0.44, 5000000L) == 8)
    // the round-15 measured nprobe 2/16 points answer in-grid — 0.7 at
    // 200k was an extrapolation (≈ 11) before 16 -> 0.724 was measured
    assert(Similarity.nprobeFor(0.37, 200000L) == 2)
    assert(Similarity.nprobeFor(0.7, 200000L) == 16)
    assert(Similarity.nprobeFor(0.8, 60000L) == 16)
    // past the row's measured nprobes: power-law extrapolation of the
    // deficit, strictly above the last measured point, monotone in the
    // target, clamped at maxDerivedNprobe
    val a = Similarity.nprobeFor(0.75, 200000L)
    val b = Similarity.nprobeFor(0.8, 200000L)
    assert(a > 16 && b >= a && b <= Similarity.maxDerivedNprobe, s"a=$a b=$b")
    assert(Similarity.nprobeFor(0.999, 200000L) == Similarity.maxDerivedNprobe)
    intercept[IllegalArgumentException](Similarity.nprobeFor(1.0, 100L))
    intercept[IllegalArgumentException](Similarity.nprobeFor(0.0, 100L))
  }

  test("nprobeForMining reads the mining grid — q160's derived constant") {
    // the registered q160 operating point: 0.8 target at the audited 1×
    // scale -> nprobe 8 (measured decision recall 0.9254; 3 -> 0.6070
    // misses) — the oracle's probe CTE pins the same constant
    assert(Similarity.nprobeForMining(0.8, 2000L) == 8)
    assert(Similarity.nprobeForMining(0.5, 2000L) == 2)  // 0.5224 >= 0.5
    // pessimistic by scale, same as the propagation rule
    assert(Similarity.nprobeForMining(0.5, 100000L) == 8)  // 200k: 0.5804
    assert(Similarity.nprobeForMining(0.7, 200000L) == 16) // 0.7020
    // the two families price different decisions: their grids disagree
    assert(Similarity.nprobeForMining(0.5, 2000L) !=
      Similarity.nprobeFor(0.5, 2000L))
  }

  test("frozen-index margin mining: micro-batch composable, seed stats " +
      "batch-independent, streaming sink idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // seed index: tight clusters around the x and y axes, plus seed 0
    // ALONE on the z axis — with ⌈√6⌉ = 3 smallest-id sample centroids
    // (z, ax, ay) it is its own cluster's only member: no within-index
    // neighbor, no calibrated hubness, never mined against
    val seeds = ((1L until 5L).map(i =>
      (i, vec(if (i % 2 == 1) ax else ay, 0.1f, i.toInt), 1)) :+
      (0L, Seq(0f, 0f, 1f, 0f), 1) :+
      (5L, vec(ax, 0.1f, 5), 1))
      .toDF("vec_id", "embedding", "label")
    val cents = Similarity.sampleCentroids(seeds,
      Similarity.indexParams(6).nlist)
    val home = Similarity.assignBuckets(seeds, cents)
      .select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    assert(home.count(_._2 == home(0L)) == 1, s"fixture: seed 0 must be alone: $home")
    val batch = Seq(
      (100L, vec(ax, 0.05f, 50), 0),
      (101L, vec(ay, 0.05f, 51), 0),
      (102L, vec(ax, 0.08f, 52), 0),
      (103L, Seq(0f, 0.05f, 0.999f, 0f), 0) // best cosine = the singleton
    ).toDF("vec_id", "embedding", "label")
    val mine = (b: org.apache.spark.sql.DataFrame) =>
      Similarity.marginMineAgainstSeeds(seeds, b, cents, k = 2,
        threshold = 0.0, nprobe = 2)
    val whole = mine(batch).collect().map(_.toSeq).toSet
    assert(whole.nonEmpty)
    // the singleton seed is never a tgt_id — not even for source 103,
    // whose raw-cosine best IT is: no hubness stats, no mining (the
    // stats join is inner, the frozen analog of den > 0)
    assert(!whole.exists(_(1) == 0L), s"singleton seed mined: $whole")
    // micro-batch composability: per-source decisions read only the
    // frozen index, so mining two slices separately equals their union
    val split =
      mine(batch.filter(col("vec_id") < 102)).collect().map(_.toSeq).toSet ++
      mine(batch.filter(col("vec_id") >= 102)).collect().map(_.toSeq).toSet
    assert(split == whole, s"split=$split whole=$whole")
    // nprobe=1 takes the home-assignment path and is composable too
    val one = Similarity.marginMineAgainstSeeds(seeds, batch, cents,
      k = 2, threshold = 0.0, nprobe = 1).collect().map(_.toSeq).toSet
    val oneSplit =
      Similarity.marginMineAgainstSeeds(seeds,
        batch.filter(col("vec_id") % 2 === 0), cents, k = 2,
        threshold = 0.0).collect().map(_.toSeq).toSet ++
      Similarity.marginMineAgainstSeeds(seeds,
        batch.filter(col("vec_id") % 2 =!= 0), cents, k = 2,
        threshold = 0.0).collect().map(_.toSeq).toSet
    assert(oneSplit == one, s"nprobe=1 split=$oneSplit whole=$one")
    // streaming: foreachBatch mines each micro-batch against the frozen
    // index; the accumulated table equals the batch-form union, and an
    // at-least-once REPLAY of a micro-batch overwrites its own batchId
    // partition instead of appending duplicates
    val input = MemoryStream[(Long, Seq[Float], Int)]
    val out = java.nio.file.Files.createTempDirectory("graft-mmine").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mmine-ck").toString
    val q = Similarity.streamingMarginMineIngest(
      input.toDF().toDF("vec_id", "embedding", "label"),
      seeds, cents, out, ckpt, k = 2, threshold = 0.0, nprobe = 2)
    try {
      input.addData((100L, vec(ax, 0.05f, 50), 0), (101L, vec(ay, 0.05f, 51), 0))
      q.processAllAvailable()
      input.addData((102L, vec(ax, 0.08f, 52), 0), (103L, Seq(0f, 0.05f, 0.999f, 0f), 0))
      q.processAllAvailable()
      val table = spark.read.parquet(out)
      assert(table.drop("batch_id").collect().map(_.toSeq).toSet == whole)
      mine(batch.filter(col("vec_id") >= 102))
        .withColumn("batch_id", lit(1L))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out)
      val replayed = spark.read.parquet(out).drop("batch_id")
        .collect().map(_.toSeq).toSet
      assert(replayed == whole, s"replay must be idempotent: $replayed")
    } finally q.stop()
  }

  test("margin index: build-once + per-batch mine is bit-identical to the one-shot form") {
    val seeds = ((1L until 5L).map(i =>
      (i, vec(if (i % 2 == 1) ax else ay, 0.1f, i.toInt), 1)) :+
      (0L, Seq(0f, 0f, 1f, 0f), 1) :+
      (5L, vec(ax, 0.1f, 5), 1))
      .toDF("vec_id", "embedding", "label")
    val cents = Similarity.sampleCentroids(seeds,
      Similarity.indexParams(6).nlist)
    val batch = Seq(
      (100L, vec(ax, 0.05f, 50), 0),
      (101L, vec(ay, 0.05f, 51), 0),
      (102L, vec(ax, 0.08f, 52), 0),
      (103L, Seq(0f, 0.05f, 0.999f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    for (np <- Seq(1, 2)) {
      val oneShot = Similarity.marginMineAgainstSeeds(seeds, batch, cents,
        k = 2, threshold = 0.0, nprobe = np).collect().map(_.toSeq).toSet
      val lazyIdx = Similarity.buildMarginIndex(seeds, cents, k = 2)
      assert(Similarity.marginMineAgainstIndex(lazyIdx, batch, cents, k = 2,
        threshold = 0.0, nprobe = np).collect().map(_.toSeq).toSet == oneShot,
        s"lazy index diverged at nprobe=$np")
      // the streaming path's materialized (localCheckpointed) index — the
      // build-once contract — must not change a single decision
      val frozen = lazyIdx.materialize()
      assert(Similarity.marginMineAgainstIndex(frozen, batch, cents, k = 2,
        threshold = 0.0, nprobe = np).collect().map(_.toSeq).toSet == oneShot,
        s"materialized index diverged at nprobe=$np")
    }
  }

  test("marginMiningRecallAudit: full probe recovers every exact decision; " +
      "narrow probe only loses, never invents, at an unchanged decision tail") {
    val seeds = ((1L until 5L).map(i =>
      (i, vec(if (i % 2 == 1) ax else ay, 0.1f, i.toInt), 1)) :+
      (0L, Seq(0f, 0f, 1f, 0f), 1) :+
      (5L, vec(ax, 0.1f, 5), 1))
      .toDF("vec_id", "embedding", "label")
    val cents = Similarity.sampleCentroids(seeds,
      Similarity.indexParams(6).nlist)
    val batch = Seq(
      (100L, vec(ax, 0.05f, 50), 0),
      (101L, vec(ay, 0.05f, 51), 0),
      (102L, vec(ax, 0.08f, 52), 0),
      (103L, Seq(0f, 0.05f, 0.999f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    // nprobe = centroid count: the probed candidate set IS the exact
    // arm's (index.sd), so every exact decision is recovered verbatim
    val full = Similarity.marginMiningRecallAudit(seeds, batch, cents,
      k = 2, threshold = 0.0, nprobe = cents.size).collect()
    assert(full.length == 4)
    val mined = full.filter(!_.isNullAt(1))
    assert(mined.nonEmpty, "fixture must mine at least one exact pair")
    assert(mined.forall(r => r.getLong(3) == 1L),
      s"full probe must recover all: ${full.mkString(";")}")
    assert(full.filter(_.isNullAt(1)).forall(_.isNullAt(2)),
      "full probe cannot mine a source the exact arm didn't")
    // full-probe decisions ARE the exact decisions, so the spurious
    // flag (bucketed mined where exact didn't, or a different seed)
    // must be identically zero — and on every row it must equal its
    // definition over the two target columns
    assert(full.forall(_.getLong(4) == 0L),
      s"full probe cannot be spurious: ${full.mkString(";")}")
    def spuriousConsistent(rows: Array[org.apache.spark.sql.Row]) =
      rows.forall { r =>
        val expect = !r.isNullAt(2) && (r.isNullAt(1) ||
          r.getLong(2) != r.getLong(1))
        r.getLong(4) == (if (expect) 1L else 0L)
      }
    assert(spuriousConsistent(full))
    // exact arm is nprobe-independent: same exact_tgt column at nprobe=1
    val one = Similarity.marginMiningRecallAudit(seeds, batch, cents,
      k = 2, threshold = 0.0, nprobe = 1).collect()
    def m(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(m(one) == m(full), "exact decisions must not depend on nprobe")
    assert(one.map(_.getLong(3)).sum <= full.map(_.getLong(3)).sum)
    assert(spuriousConsistent(one))
    // the indexed overload against a pre-built materialized index (the
    // sweep caller's shape) must be row-identical to the one-shot form
    val idx = Similarity.buildMarginIndex(seeds, cents, k = 2).materialize()
    val indexed = Similarity.marginMiningRecallAuditIndexed(idx, batch,
      cents, k = 2, threshold = 0.0, nprobe = 1).collect()
    assert(indexed.map(_.toSeq).toSet == one.map(_.toSeq).toSet,
      "indexed audit diverged from the one-shot form")
    // the round-16 index contract: a mismatched k or quantizer is a
    // loud error, not a silently skewed margin
    intercept[IllegalArgumentException] {
      Similarity.marginMineAgainstIndex(idx, batch, cents, k = 3)
    }
    intercept[IllegalArgumentException] {
      Similarity.marginMineAgainstIndex(idx, batch,
        cents.map { case (c, v) => (c, v.map(_ + 1f)) }, k = 2)
    }
  }

  test("multi-probe margin mining is a candidate superset at nprobe=1 parity") {
    val labeled = embeddings.withColumn("label",
      when(col("vec_id") % 2 === 0, 0).otherwise(1))
    val one = Similarity.marginMinedPairs(labeled, 0, 1, threshold = 0.0)
      .collect().map(_.toSeq).toSet
    val oneExplicit = Similarity.marginMinedPairs(labeled, 0, 1,
      threshold = 0.0, nprobe = 1).collect().map(_.toSeq).toSet
    assert(one == oneExplicit, "nprobe=1 must be the default path")
    // nprobe at the centroid count = every source sees every (uncapped)
    // cluster: mined sources are a superset of the single-probe ones
    val nlist = Similarity.indexParams(11).nlist
    val all = Similarity.marginMinedPairs(labeled, 0, 1, threshold = 0.0,
      nprobe = nlist).collect().map(_.toSeq).toSet
    val srcOf = (s: Set[Seq[Any]]) => s.map(_.head.asInstanceOf[Long])
    assert(srcOf(one).subsetOf(srcOf(all)),
      s"single=${srcOf(one)} multi=${srcOf(all)}")
  }
}

package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Every extension operator must degrade to an empty result — not throw —
  * on an empty input table (partition-edge behavior a 100 TB job hits
  * whenever a filter eliminates a whole input).
  */
class EmptyInputSpec extends SparkSpecBase {
  import spark.implicits._

  private val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("dedup family on empty corpus") {
    assert(Dedup.dropExactDups(emptyDocs).count() == 0)
    assert(Dedup.candidatePairs(emptyDocs).count() == 0)
    assert(Dedup.verifiedNearDups(emptyDocs).count() == 0)
    assert(Dedup.dropNearDups(emptyDocs).count() == 0)
    assert(Dedup.dropNearDupsCC(emptyDocs).count() == 0)
    assert(Dedup.simHashPairs(emptyDocs).count() == 0)
    assert(Dedup.contaminationPairs(emptyDocs, emptyDocs).count() == 0)
  }

  test("text/sampling/packing on empty inputs") {
    assert(TextAnalysis.documentFeatures(emptyDocs).count() == 0)
    assert(TextAnalysis.tfIdfTopTerms(emptyDocs).count() == 0)
    assert(Sampling.stratifiedSample(emptyDocs, col("text"),
      Map("en" -> 0.5), defaultRate = 1.0).count() == 0)
    assert(Packing.packOffsets(
      Seq.empty[(Long, Long)].toDF("doc_id", "n_tokens"), 10L).count() == 0)
  }

  test("similarity family on empty embeddings") {
    val emptyEmb = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val centroids = Seq(0 -> Seq(1f, 0f), 1 -> Seq(0f, 1f))
    assert(Similarity.bruteForceTopK(emptyEmb, Seq(1f, 0f), 5).count() == 0)
    assert(Similarity.ivfTopK(Similarity.assignBuckets(emptyEmb, centroids),
      centroids, Seq(1f, 0f), 5).count() == 0)
    assert(Similarity.cosineNearDupPairs(emptyEmb, threshold = 0.5,
      planes = 8, bands = 4, dim = 2).count() == 0)
    assert(Similarity.rprojTopK(emptyEmb, Seq(1f, 0f), 5, dimOut = 2)
      .count() == 0)
    // round-8 snapshot path: empty history admits everything non-self-dup,
    // empty batch yields empty output, empty snapshot table parses
    val vecs = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.cosineBandSnapshot(emptyEmb, bands = 4).count() == 0)
    val emptySnap = Similarity.cosineBandSnapshot(emptyEmb, bands = 4)
    assert(Similarity.incrementalCosineDedupAgainstSnapshot(
      emptyEmb, emptySnap, vecs, threshold = 0.99, planes = 64).count() == 2)
    assert(Similarity.incrementalCosineDedupAgainstSnapshot(
      vecs, Similarity.cosineBandSnapshot(vecs, bands = 4), emptyEmb,
      threshold = 0.99, planes = 64).count() == 0)
    // derived sizing on a zero-count corpus is well-defined
    assert(Similarity.indexParams(0) == Similarity.IndexParams(1, 64, 4))
    // round-11 cluster-bounded ops: empty corpus, and one-empty-side
    val emptyLbl = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    val lbl = Seq((1L, Seq(1f, 0f), 0), (2L, Seq(0.9f, 0.1f), 1))
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.marginMinedPairs(emptyLbl, 0, 1).count() == 0)
    // target side empty -> nothing to mine; source side empty -> ditto
    assert(Similarity.marginMinedPairs(lbl, 0, 9).count() == 0)
    assert(Similarity.marginMinedPairs(lbl, 9, 1).count() == 0)
    assert(Similarity.knnLabelPropagation(emptyLbl,
      isSeed = col("vec_id") % 3 === 0).count() == 0)
    // all seeds -> no targets to label; no seeds -> nothing predictable
    assert(Similarity.knnLabelPropagation(lbl, isSeed = lit(true))
      .count() == 0)
    assert(Similarity.knnLabelPropagation(lbl, isSeed = lit(false))
      .count() == 0)
    // join-path assignment over empty vectors and empty centroid table:
    // an empty QUANTIZER emits one null-bucket row per vector — the
    // assignBuckets contract (round-12 fix: the crossJoin form silently
    // dropped the corpus instead)
    assert(Similarity.assignBucketsJoin(emptyEmb,
      Seq((0, Seq(1f, 0f))).toDF("cid", "centroid")).count() == 0)
    val nullAsg = Similarity.assignBucketsJoin(vecs,
      Seq.empty[(Int, Seq[Float])].toDF("cid", "centroid"))
    assert(nullAsg.count() == vecs.count())
    assert(nullAsg.filter(col("bucket").isNull).count() == vecs.count())
    // the recall audit, ingest-form, and multi-probe paths are
    // well-defined on empties
    assert(Similarity.knnPropagationRecallAudit(emptyLbl,
      isSeed = col("vec_id") % 3 === 0).count() == 0)
    assert(Similarity.knnLabelsAgainstSeeds(emptyLbl, lbl,
      Seq.empty).count() == 0)
    assert(Similarity.knnLabelsAgainstSeeds(lbl, emptyLbl,
      Seq(0 -> Seq(1f, 0f))).count() == 0)
    assert(Similarity.knnLabelPropagation(emptyLbl,
      isSeed = col("vec_id") % 3 === 0, nprobe = 2).count() == 0)
    assert(Similarity.marginMinedPairs(emptyLbl, 0, 1, nprobe = 2).count() == 0)
    // frozen-index mining: empty seed side, empty batch side, no centroids
    assert(Similarity.marginMineAgainstSeeds(emptyLbl, lbl,
      Seq(0 -> Seq(1f, 0f)), nprobe = 2).count() == 0)
    assert(Similarity.marginMineAgainstSeeds(lbl, emptyLbl,
      Seq(0 -> Seq(1f, 0f)), nprobe = 2).count() == 0)
    assert(Similarity.marginMineAgainstSeeds(lbl, lbl, Seq.empty,
      nprobe = 2).count() == 0)
  }

  test("round-4 second-half operators on empty inputs") {
    assert(TextAnalysis.repetitionSignals(emptyDocs).count() == 0)
    assert(TextAnalysis.vocabCoverage(emptyDocs).count() == 0)
    assert(TextAnalysis.rareTokenRatio(emptyDocs).count() == 0)
    assert(Chunking.chunkTokens(emptyDocs, 32, 24).count() == 0)
    assert(Sampling.temperatureResample(emptyDocs, col("text"),
      alpha = 0.5, targetFrac = 0.5).count() == 0)
    assert(Dedup.keepBestByComponents(emptyDocs,
      Seq.empty[(Long, Long)].toDF("id1", "id2"), lit(1.0)).count() == 0)
    assert(Dedup.contaminationReport(emptyDocs, emptyDocs).count() == 0)
    assert(Dedup.estimatorCalibration(emptyDocs).count() == 0)
    assert(Dedup.dupClusterHistogram(emptyDocs).count() == 0)
    assert(Packing.chunkManifest(
      Seq.empty[(Long, Long)].toDF("doc_id", "n_tokens"), 10L).count() == 0)
    assert(graft.operators.PrefixSum.withGlobalCumSum(
      Seq.empty[(Long, Long)].toDF("id", "v"),
      Seq(col("id")), col("v"), "cum").count() == 0)
  }

  test("round-5 operators on empty inputs") {
    val someDocs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val emptyEmb = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val centroids = Seq(0 -> Seq(1f, 0f), 1 -> Seq(0f, 1f))
    assert(TextAnalysis.scrubPii(emptyDocs).count() == 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs).count() == 0)
    assert(Dedup.containmentPairs(emptyDocs).count() == 0)
    assert(Similarity.semanticDedupPairs(emptyEmb, centroids).count() == 0)
    assert(Similarity.dropSemanticDups(emptyEmb, centroids).count() == 0)
    // empty batch admits nothing; empty history admits the whole batch
    assert(Dedup.incrementalDedupBatch(someDocs, emptyDocs).count() == 0)
    assert(Dedup.incrementalDedupBatch(emptyDocs, someDocs).count() == 1)
    assert(Dedup.incrementalDedupBatch(emptyDocs, emptyDocs).count() == 0)
    val emptyMedia = MultiModal.syntheticMediaFromDocs(
      Seq.empty[(Long, String, String, String, Long)]
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    assert(MultiModal.resizeImageFeatures(emptyMedia, factor = 2).count() == 0)
    assert(MultiModal.jpegReencodeFeatures(emptyMedia).count() == 0)
    assert(MultiModal.sampleVideoFrames(emptyMedia).count() == 0)
    assert(MultiModal.extractImageFeatures(emptyMedia).count() == 0)
    assert(TextAnalysis.scrubBoilerplate(emptyDocs).count() == 0)
    assert(TextAnalysis.scrubBoilerplateAgainst(emptyDocs,
      TextAnalysis.segmentDf(someDocs),
      someDocs.agg(count(lit(1)).as("n_docs"))).count() == 0)
    assert(Sampling.topFractionByStratum(emptyDocs, col("text"),
      length(col("text")), frac = 0.5).count() == 0)
    assert(Packing.shuffledExportManifest(
      Seq.empty[(Long, Long)].toDF("doc_id", "n_tokens"), 64L).count() == 0)
    assert(graft.operators.FuzzyJoin.selfJoinEditDistance1(
      Seq.empty[(Long, String)].toDF("id", "name"), "name", "id").count() == 0)
  }
}

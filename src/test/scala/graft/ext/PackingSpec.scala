package graft.ext

import graft.SparkSpecBase

class PackingSpec extends SparkSpecBase {
  import spark.implicits._

  test("pack offsets: hand-computed chunks, straddle, zero-token docs") {
    // capacity 10; cumulative offsets: 0, 7, 7, 15, 24
    val docs = Seq(
      (0L, 7L),   // [0,6]   -> chunk 0
      (1L, 0L),   // offset 7, no space -> chunk 0
      (2L, 8L),   // [7,14]  -> straddles chunks 0-1
      (3L, 9L),   // [15,23] -> straddles chunks 1-2
      (4L, 3L)    // [24,26] -> chunk 2
    ).toDF("doc_id", "n_tokens")
    val out = Packing.packOffsets(docs, capacity = 10L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._3, r._4, r._5)).toMap
    assert(out(0L) == ((0L, 0L, 0L)))
    assert(out(1L) == ((7L, 0L, 0L)))
    assert(out(2L) == ((7L, 0L, 1L)))
    assert(out(3L) == ((15L, 1L, 2L)))
    assert(out(4L) == ((24L, 2L, 2L)))
  }

  test("offsets are a pure function of id order — partitioning-invariant") {
    val docs = (0L until 500L).map(i => (i, (i % 17) + 1)).toDF("doc_id", "n_tokens")
    val a = Packing.packOffsets(docs, 64L)
      .select("doc_id", "offset").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val b = Packing.packOffsets(docs.repartition(7), 64L)
      .select("doc_id", "offset").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
    // spot-check the closed form: offset(n) = sum_{i<n} ((i%17)+1)
    val expect = (0L until 500L).scanLeft(0L)((acc, i) => acc + (i % 17) + 1)
    assert(a.forall { case (id, off) => off == expect(id.toInt) })
  }

  test("chunk manifest: interior chunks fill to capacity, totals conserve tokens") {
    val docs = (0L until 100L).map(i => (i, (i % 7) + 1)).toDF("doc_id", "n_tokens")
    val totalTokens = (0L until 100L).map(i => (i % 7) + 1).sum
    val m = Packing.chunkManifest(docs, capacity = 16L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // chunk ids are contiguous from 0
    assert(m.map(_._1) == (0L until m.size.toLong))
    // every chunk but the last holds exactly `capacity` tokens
    assert(m.dropRight(1).forall(_._3 == 16L))
    assert(m.last._3 == totalTokens - 16L * (m.size - 1))
    // token conservation across the manifest
    assert(m.map(_._3).sum == totalTokens)
    // a doc spanning a boundary is counted in both chunks' n_docs
    val spanDocs = Packing.packOffsets(docs, 16L)
      .filter($"first_chunk" =!= $"last_chunk").count()
    assert(m.map(_._2).sum == 100L + spanDocs)
  }

  test("chunk manifest: zero-token docs never appear") {
    val docs = Seq((1L, 5L), (2L, 0L), (3L, 3L)).toDF("doc_id", "n_tokens")
    val m = Packing.chunkManifest(docs, capacity = 16L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(m == Seq((0L, 2L, 8L)))
  }

  test("length-bucketed batches: exact shape, and padding beats arrival order") {
    // mixed lengths with deliberate spread: arrival-order batches mix
    // short and long docs and pay max-len padding for every short one
    val r = new scala.util.Random(13)
    val rows = (0L until 500L).map(i => (i, 5L + r.nextInt(400)))
    val docs = rows.toDF("doc_id", "n_tokens").repartition(7)
    val got = Packing.lengthBucketedBatches(docs, batchSize = 64)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // exact replay: rank by (len, id), cut into 64s
    val ranked = rows.sortBy { case (id, len) => (len, id) }
    val want = ranked.grouped(64).zipWithIndex.map { case (b, i) =>
      val lens = b.map(_._2)
      (i.toLong, b.size.toLong, lens.max, lens.sum,
        b.size * lens.max - lens.sum)
    }.toSeq
    assert(got == want)
    // every batch except the last is full
    assert(got.dropRight(1).forall(_._2 == 64L))
    // the audit's point: bucketing collapses padding vs arrival order
    val arrivalWaste = rows.grouped(64).map { b =>
      val lens = b.map(_._2); b.size * lens.max - lens.sum
    }.sum
    val bucketedWaste = got.map(_._5).sum
    assert(bucketedWaste < arrivalWaste / 4,
      s"bucketed $bucketedWaste vs arrival $arrivalWaste")
  }

  test("shuffled export: deterministic, salt-sensitive, token-contiguous shards") {
    val docs = (0L until 200L).map(i => (i, (i % 13) + 1)).toDF("doc_id", "n_tokens")
    def run(d: org.apache.spark.sql.DataFrame, salt: String) =
      Packing.shuffledExportManifest(d, shardTokens = 64L, salt = salt)
        .select("doc_id", "export_pos", "offset", "shard")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    val a = run(docs, "export")
    // partition-invariant: same manifest from any input layout
    assert(run(docs.repartition(7), "export") == a)
    // a different salt produces a different order (same doc set)
    val b = run(docs, "other-salt")
    assert(a.map(_._1) != b.map(_._1) && a.map(_._1).toSet == b.map(_._1).toSet)
    // positions are 1..n; offsets are the running token sum in that order
    assert(a.map(_._2) == (1L to 200L))
    val tok = (0L until 200L).map(i => i -> ((i % 13) + 1)).toMap
    a.foldLeft(0L) { case (cum, (id, _, off, shard)) =>
      assert(off == cum && shard == off / 64L)
      cum + tok(id)
    }
    // shards are contiguous in export order and hold ~shardTokens each
    val perShard = a.groupBy(_._4).toSeq.sortBy(_._1)
      .map { case (s, rows) => (s, rows.map(r => tok(r._1)).sum) }
    assert(perShard.dropRight(1).forall { case (_, t) => t >= 52 && t <= 76 })
  }
}

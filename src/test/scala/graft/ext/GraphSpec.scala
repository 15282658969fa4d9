package graft.ext

import graft.SparkSpecBase

class GraphSpec extends SparkSpecBase {
  import spark.implicits._

  private def ranks(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    Graph.pageRankUndirected(pairs.toDF("id1", "id2"), iters = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("one iteration on the path graph matches the hand computation") {
    // 1—2—3: deg(1)=deg(3)=1, deg(2)=2, N=3, r0 = 1/3 each
    val got = ranks(Seq((1L, 2L), (2L, 3L)), iters = 1)
    val leaf = 0.15 / 3 + 0.85 * (1.0 / 3 / 2) // receives half of 2's rank
    val hub = 0.15 / 3 + 0.85 * (1.0 / 3 + 1.0 / 3)
    assert(math.abs(got(1L) - leaf) < 1e-9)
    assert(math.abs(got(3L) - leaf) < 1e-9)
    assert(math.abs(got(2L) - hub) < 1e-9)
  }

  test("three iterations: mass conserved, symmetry kept, hub dominates") {
    val got = ranks(Seq((1L, 2L), (2L, 3L), (2L, 4L), (5L, 6L)), iters = 3)
    // teleport mass is injected per-node and every node's rank is fully
    // redistributed each round, so total mass stays 1 over the graph
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
    // 1, 3, 4 are exchangeable leaves of the star around 2
    assert(got(1L) == got(3L) && got(3L) == got(4L))
    assert(got(2L) > got(1L))
    // the isolated 5—6 pair: symmetric, and below the 4-node star's hub
    assert(got(5L) == got(6L) && got(5L) < got(2L))
    // nodes with no edges are not ranked
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("duplicate and reversed input pairs normalize away") {
    val clean = ranks(Seq((1L, 2L), (2L, 3L)), iters = 2)
    val noisy = ranks(Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 2L)), iters = 2)
    assert(clean == noisy)
  }

  private def census(pairs: Seq[(Long, Long)]) =
    Graph.triangleCensus(pairs.toDF("id1", "id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).head

  test("triangle census on closed-form graphs") {
    // single triangle: 3 wedges, 1 triangle, transitivity 1
    assert(census(Seq((1L, 2L), (2L, 3L), (1L, 3L))) == ((3L, 3L, 3L, 1L, 1.0)))
    // path 1-2-3: one wedge, no triangle
    assert(census(Seq((1L, 2L), (2L, 3L))) == ((3L, 2L, 1L, 0L, 0.0)))
    // K4: C(4,2)=6 edges, 4·C(3,2)=12 wedges, 4 triangles, transitivity 1
    assert(census(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
      == ((4L, 6L, 12L, 4L, 1.0)))
    // star around 1: 3 wedges at the hub, no triangle
    assert(census(Seq((1L, 2L), (1L, 3L), (1L, 4L))) == ((4L, 3L, 3L, 0L, 0.0)))
    // triangle + pendant edge: wedges 3 + C(3,2)... deg = (3,2,2,1):
    // 3+1+1+0 = 5 wedges, 1 triangle, transitivity 3/5
    assert(census(Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)))
      == ((4L, 4L, 5L, 1L, 0.6)))
  }

  test("triangle census normalizes duplicate and reversed pairs") {
    val clean = census(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    val noisy = census(Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)))
    assert(clean == noisy)
  }

  test("result is deterministic under repartitioning") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val a = Graph.pageRankUndirected(pairs.toDF("id1", "id2"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val b = Graph.pageRankUndirected(pairs.toDF("id1", "id2").repartition(7))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(a == b)
  }
}

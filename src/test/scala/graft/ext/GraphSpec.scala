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

  test("edge support matches hand-computed common-neighbor counts") {
    // triangle 1-2-3 plus pendant 1-4; mark edges touching node 2
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("id1", "id2")
    val out = Graph.edgeSupport(pairs,
        org.apache.spark.sql.functions.col("id1") === 2 ||
          org.apache.spark.sql.functions.col("id2") === 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // (1,2): common neighbor 3; (2,3): common neighbor 1
    assert(out == Map((1L, 2L) -> 1L, (2L, 3L) -> 1L))
    // support counted over the FULL graph even for unmarked-edge checks:
    // marking everything scores the pendant edge at support 0
    val all = Graph.edgeSupport(pairs,
        org.apache.spark.sql.functions.lit(true))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(all((1L, 4L)) == 0L && all((1L, 3L)) == 1L)
  }

  test("randomized graphs agree with brute-force local references") {
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = 4 + rng.nextInt(8)
      val es = (for {
        u <- 0 until n; v <- (u + 1) until n
        if rng.nextDouble() < 0.35
      } yield (u.toLong, v.toLong)).toSeq
      if (es.nonEmpty) {
        val adj = es.flatMap { case (u, v) => Seq(u -> v, v -> u) }
          .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
        val nodes = adj.keys.toSeq.sorted
        // brute-force references
        val refTri = (for {
          a <- nodes; b <- nodes if a < b && adj(a)(b)
          c <- nodes if b < c && adj(a)(c) && adj(b)(c)
        } yield 1).size.toLong
        val refWedges = nodes.map { x =>
          val d = adj(x).size.toLong; d * (d - 1) / 2
        }.sum
        val (gn, ge, gw, gt, _) = census(es)
        assert((gn, ge, gw, gt) ==
          ((nodes.size.toLong, es.size.toLong, refWedges, refTri)),
          s"census trial $trial: edges $es")
        // 3-round PageRank vs a local power iteration (same rounding)
        val got = ranks(es.map { case (u, v) => (u, v) }, iters = 3)
        var pr = nodes.map(_ -> 1.0 / nodes.size).toMap
        for (_ <- 1 to 3)
          pr = nodes.map { x =>
            val m = adj(x).toSeq.map(y => pr(y) / adj(y).size).sum
            x -> BigDecimal(0.15 / nodes.size + 0.85 * m)
              .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
          }.toMap
        nodes.foreach { x =>
          assert(math.abs(got(x) - pr(x)) < 1e-9,
            s"pagerank trial $trial node $x: ${got(x)} vs ${pr(x)}")
        }
        // edge support vs local common-neighbor counts (all edges marked)
        val sup = Graph.edgeSupport(es.toDF("id1", "id2"),
            org.apache.spark.sql.functions.lit(true))
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
          .toMap
        es.foreach { case (u, v) =>
          assert(sup((u, v)) == adj(u).intersect(adj(v)).size.toLong,
            s"support trial $trial edge ($u,$v)")
        }
      }
    }
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

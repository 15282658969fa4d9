package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("finds substitution, insertion, and identical pairs; excludes distance 2") {
    val df = Seq(
      (1L, "spark"),
      (2L, "spork"),   // substitution of 1
      (3L, "spark"),   // identical to 1 → dist 0
      (4L, "sparks"),  // insertion on 1
      (5L, "zzz")      // unrelated
    ).toDF("id", "name")
    val pairs = FuzzyJoin.selfJoinEditDistance1(df, "name", "id")
      .as[(Long, Long, Int)].collect().toSet
    // (2,4) "spork"/"sparks" is distance 2 — blocked or filtered either way
    assert(pairs == Set((1L, 2L, 1), (1L, 3L, 0), (1L, 4L, 1),
      (2L, 3L, 1), (3L, 4L, 1)))
  }

  test("deletion keys: dedup, empty-string guard, neighborhood property") {
    val ks = Seq(("aa"), (""), ("ab")).toDF("s")
      .select(FuzzyJoin.deletionKeys(col("s"))).as[Seq[String]].collect()
    assert(ks(0).sorted == Seq("a", "aa"))   // duplicate deletion deduped
    assert(ks(1) == Seq(""))                  // empty string survives
    assert(ks(2).sorted == Seq("a", "ab", "b"))
  }

  test("exact-duplicate input rows do not re-expand deduped pairs") {
    // id 9 appears twice with the same name: the candidate dedup keeps one
    // (7,9) pair and the name rejoin must not multiply it back out
    val df = Seq((7L, "ab"), (9L, "ac"), (9L, "ac")).toDF("id", "name")
    val pairs = FuzzyJoin.selfJoinEditDistance1(df, "name", "id")
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs == Seq((7L, 9L, 1)))
  }

  test("matches all-pairs brute force on random corpora") {
    // Exact-recall claim: the deletion-neighborhood blocking may generate
    // false candidates (removed by the verify) but can never MISS an
    // ED≤1 pair. A tiny alphabet and short lengths make every edit class
    // (substitution, indel, identical, empty string) common, then the
    // operator must equal a driver-side full quadratic Levenshtein.
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (seed <- Seq(7, 21)) {
      val r = new scala.util.Random(seed)
      val rows = (0L until 80L).map { id =>
        (id, Seq.fill(r.nextInt(6))("abc" (r.nextInt(3))).mkString)
      }
      val expected = (for {
        (i, si) <- rows; (j, sj) <- rows if i < j
        d = lev(si, sj) if d <= 1
      } yield (i, j, d)).toSet
      val got = FuzzyJoin.selfJoinEditDistance1(
        rows.toDF("id", "name"), "name", "id")
        .as[(Long, Long, Int)].collect().toSet
      assert(got == expected,
        s"seed=$seed missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("hot-key guard bounds a degenerate all-identical corpus") {
    val same = (0L until 60L).map(i => (i, "dup")).toDF("id", "name")
    assert(FuzzyJoin.selfJoinEditDistance1(same, "name", "id",
      maxKeyBucket = 10).count() == 0)
    assert(FuzzyJoin.selfJoinEditDistance1(same, "name", "id",
      maxKeyBucket = 100).count() == 60L * 59L / 2)
  }
}

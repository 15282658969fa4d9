package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpecBase {
  import spark.implicits._

  test("global cum sum and rank match the single-task window") {
    val df = (1L to 500L).map(i => (i, (i * 7919) % 97)).toDF("id", "v")
    val out = PrefixSum.withGlobalCumSum(df, Seq(col("id")), col("v"),
        "cum", Some("rk"))
      .select("id", "cum", "rk").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    var running = 0L
    (1L to 500L).foreach { i =>
      running += (i * 7919) % 97
      assert(out(i) == ((running, i)), s"at id $i")
    }
  }

  test("result is partitioning-invariant") {
    val df = (1L to 300L).map(i => (i, i % 13)).toDF("id", "v")
    val a = PrefixSum.withGlobalCumSum(df, Seq(col("id")), col("v"), "cum")
      .select("id", "cum").as[(Long, Long)].collect().sorted.toSeq
    val b = PrefixSum.withGlobalCumSum(df.repartition(17), Seq(col("id")),
        col("v"), "cum")
      .select("id", "cum").as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  test("descending order and negative values") {
    val df = Seq((1L, 5L), (2L, -3L), (3L, 10L)).toDF("id", "v")
    // order by id desc: 3 (10), 2 (-3), 1 (5)
    val out = PrefixSum.withGlobalCumSum(df, Seq(col("id").desc), col("v"),
        "cum", Some("rk"))
      .select("id", "cum", "rk").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(3L) == ((10L, 1L)) && out(2L) == ((7L, 2L)) && out(1L) == ((12L, 3L)))
  }
}

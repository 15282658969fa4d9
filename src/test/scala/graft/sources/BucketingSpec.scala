package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpecBase {
  import spark.implicits._

  // AQE wraps the plan, so count Exchange nodes in the explain text
  // (simpleString mode shows the pre-execution plan including exchanges)
  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)).length

  test("co-bucketed join runs without any exchange and matches the plain join") {
    val left = (0L until 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (0L until 1000L).filter(_ % 3 == 0).map(i => (i, i * 2)).toDF("k", "rv")
    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Bucketing.writeBucketed(left, "bspec_left", "k", buckets = 4)
      Bucketing.writeBucketed(right, "bspec_right", "k", buckets = 4)
      val joined = Bucketing.cobucketedJoin(spark, "bspec_left", "bspec_right", "k")
      assert(shuffles(joined) == 0,
        s"expected exchange-free co-bucketed join:\n${joined.queryExecution.executedPlan}")
      val expected = left.join(right, "k")
      assert(shuffles(expected) > 0) // the plain join DOES shuffle both sides
      assert(joined.count() == expected.count())
      assert(joined.select(sum("rv")).as[Long].head() ==
        expected.select(sum("rv")).as[Long].head())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
      spark.sql("DROP TABLE IF EXISTS bspec_left")
      spark.sql("DROP TABLE IF EXISTS bspec_right")
    }
  }

  test("aggregation on the bucket key also skips the exchange") {
    val df = (0L until 1000L).map(i => (i % 50, i)).toDF("k", "v")
    try {
      Bucketing.writeBucketed(df, "bspec_agg", "k", buckets = 4)
      val agg = spark.table("bspec_agg").groupBy("k").agg(sum("v").as("s"))
      assert(shuffles(agg) == 0,
        s"expected exchange-free bucketed aggregation:\n${agg.queryExecution.executedPlan}")
      val expected = df.groupBy("k").agg(sum("v").as("s"))
        .as[(Long, Long)].collect().toMap
      assert(agg.as[(Long, Long)].collect().toMap == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bspec_agg")
    }
  }
}

package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Bucketing evidence for the 100 TB story: two tables bucketed on the join
  * key join WITHOUT any Exchange — the shuffle happened once at write time
  * and every subsequent join reuses it. This is the plan shape a repeated
  * fact⋈fact join must have at scale.
  */
class BucketingSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucketed tables join with zero shuffles; unbucketed join needs them") {
    val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 1000L).map(i => (i, i * 2)).toDF("k", "rv")

    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bucketed_left")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bucketed_right")

    // disable broadcast so the join strategy is decided by partitioning
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketedJoin = spark.table("bucketed_left")
        .join(spark.table("bucketed_right"), "k")
      val bucketedPlan = bucketedJoin.queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$bucketedPlan")
      assert(bucketedJoin.count() == 1000)

      val plainJoin = left.join(right, "k")
      val plainPlan = plainJoin.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange"),
        "control: the unbucketed join should need a shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bucketed_left")
      spark.sql("DROP TABLE IF EXISTS bucketed_right")
    }
  }
}

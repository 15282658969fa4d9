package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpecBase {
  import spark.implicits._

  test("two-phase topKPerKey equals the single-window global top-k") {
    val r = new scala.util.Random(7)
    val rows = (1 to 500).map(i => (i.toLong, r.nextInt(4), r.nextDouble()))
    // many input partitions so phase 1 actually prunes per-partition
    val df = rows.toDF("id", "key", "score").repartition(13)
    val got = TopK.topKPerKey(df, Seq(col("key")),
        Seq(col("score").desc, col("id").asc), 5, rankCol = Some("rank"))
      .select("key", "rank", "id").as[(Int, Int, Long)].collect().toSet
    val w = Window.partitionBy(col("key"))
      .orderBy(col("score").desc, col("id").asc)
    val want = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("key", "rank", "id").as[(Int, Int, Long)].collect().toSet
    assert(got == want && got.size == 20)
  }

  test("k larger than a key's row count returns all its rows, ranked") {
    val df = Seq((1L, "a", 3.0), (2L, "a", 1.0), (3L, "b", 2.0))
      .toDF("id", "key", "score").repartition(4)
    val got = TopK.topKPerKey(df, Seq(col("key")),
        Seq(col("score").desc, col("id").asc), 10, rankCol = Some("rank"))
      .select("key", "rank", "id").as[(String, Int, Long)].collect().toSet
    assert(got == Set(("a", 1, 1L), ("a", 2, 2L), ("b", 1, 3L)))
  }
}

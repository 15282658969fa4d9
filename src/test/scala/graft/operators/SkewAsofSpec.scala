package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SkewAsofSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted count equals plain groupBy count on a skewed distribution") {
    // hot key "A" has 10k rows, others a handful
    val df = (Seq.fill(10000)("A") ++ Seq.fill(7)("B") ++ Seq.fill(3)("C"))
      .toDF("k")
    val plain = df.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted("A") == 10000L)
  }

  test("salted sum equals plain sum") {
    val df = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val out = Skew.saltedSum(df, Seq("k"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("hot" -> 500500L))
  }

  test("as-of backward join: ties inclusive, no-match null, per-key isolation") {
    val left = Seq(
      ("k1", 10L, "l1"),
      ("k1", 20L, "l2"),
      ("k1", 5L, "l3"),   // before any right row → null
      ("k2", 10L, "l4")   // k2 has no right rows → null
    ).toDF("key", "ts", "tag")
    val right = Seq(
      ("k1", 10L), // equal ts to l1 → inclusive match
      ("k1", 15L),
      ("k1", 7L)
    ).toDF("key", "ts")
    val out = AsofJoin.backward(left, right, "key", "key", "ts", "ts")
      .select(col("tag"), col("asof_ts"))
      .collect().map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(out == Map(
      "l1" -> Some(10L), // 10 ≤ 10 inclusive
      "l2" -> Some(15L),
      "l3" -> None,
      "l4" -> None))
  }
}

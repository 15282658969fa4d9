package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class NativeExpressionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("dotF matches the plain-Scala dot product and survives codegen") {
    val df = Seq((Seq(1.5f, -2f, 3f), Seq(2f, 0.5f, 4f))).toDF("a", "b")
    val d = df.select(native.dotF(col("a"), col("b"))).as[Double].head()
    assert(math.abs(d - (1.5 * 2 + -2 * 0.5 + 3 * 4)) < 1e-12)
  }

  test("minHashSig: identical inputs identical sigs; length k; empty input sentinel") {
    val df = Seq(
      (0L, Seq("a", "b", "c")),
      (1L, Seq("a", "b", "c")),
      (2L, Seq.empty[String])).toDF("id", "sh")
    val sigs = df.select(col("id"), native.minHashSig(col("sh"), 8))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L).length == 8)
    assert(sigs(2L).forall(_ == Long.MaxValue))
  }

  test("SQL registration: native functions callable from spark.sql") {
    native.registerAll(spark)
    val row = spark.sql(
      """SELECT simhash64(array('spark', 'engine')) AS sh,
                dot_product_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
                              array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dp,
                size(word_shingles('a b c d', 3)) AS nsh,
                size(minhash_sig(array('x'), 4)) AS k
      """).collect().head
    assert(row.getDouble(1) == 11.0)
    assert(row.getInt(2) == 2) // "a b c", "b c d"
    assert(row.getInt(3) == 4)
    // simhash deterministic across invocations
    val again = spark.sql("SELECT simhash64(array('spark', 'engine'))").collect().head.getLong(0)
    assert(row.getLong(0) == again)
  }

  test("GraftExtensions exposes the same builders") {
    // unit-level: the extension registers every sqlFunctions entry
    assert(native.sqlFunctions.map(_._1).sorted ==
      Seq("dot_product_f", "hyperplane_sign_bits", "minhash_sig",
        "minhash_sig_p", "simhash60_p", "simhash64", "word_shingles"))
  }
}

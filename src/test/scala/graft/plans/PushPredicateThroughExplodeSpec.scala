package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PushPredicateThroughExplodeSpec extends SparkSpecBase {
  import spark.implicits._

  private val ruleName = PushPredicateThroughExplode.ruleName

  private val df = Seq(
    (1L, Seq("a", "b", "c", "b")),
    (2L, Seq("b", "b")),
    (3L, Seq("x", "y")),
    (4L, Seq.empty[String]),
    (5L, Seq(null.asInstanceOf[String], "b"))
  ).toDF("id", "arr")

  test("predicate on the generated column moves inside the array") {
    val q = df.select(col("id"), explode(col("arr")).as("t"))
      .filter(col("t") === "b")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("explode(filter(") && opt.contains("lambdafunction"),
      s"expected pushed array filter in:\n$opt")
    // and the rewrite preserves exact row multiset (duplicates included)
    assert(q.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 1L, 2L, 2L, 5L))
  }

  test("rewrite matches the rule-disabled plan row-for-row") {
    val run = () => df
      .select(col("id"), explode(col("arr")).as("t"))
      .filter(col("t").isin("a", "b") && col("id") > 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val withRule = run()
    val prev = spark.conf.getOption("spark.sql.optimizer.excludedRules")
    spark.conf.set("spark.sql.optimizer.excludedRules", ruleName)
    try assert(run() == withRule && withRule.nonEmpty)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.optimizer.excludedRules", v)
      case None => spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }

  test("mixed conjuncts: element part pushes, child part stays a Filter") {
    val q = df.select(col("id"), explode(col("arr")).as("t"))
      .filter(col("t") === "b" && col("id") < 3)
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("explode(filter(") && opt.contains("lambdafunction"))
    assert(q.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 1L, 2L, 2L))
  }

  test("outer explodes are NOT rewritten") {
    val outerQ = df.select(col("id"), explode_outer(col("arr")).as("t"))
      .filter(col("t") === "b")
    assert(!outerQ.queryExecution.optimizedPlan.toString.contains("lambdafunction"))
    // outer semantics: doc 4's null row is dropped by the FILTER, which
    // an array-level rewrite would instead turn into an empty-array row
    assert(outerQ.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 1L, 2L, 2L, 5L))
    val posOuterQ = df.select(col("id"), posexplode_outer(col("arr")))
      .filter(col("col") === "b")
    assert(!posOuterQ.queryExecution.optimizedPlan.toString.contains("lambdafunction"))
    assert(posOuterQ.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 1L, 2L, 2L, 5L))
  }

  test("posexplode value-predicates push with ORIGINAL positions preserved") {
    val posQ = df.select(col("id"), posexplode(col("arr")))
      .filter(col("col") === "b")
    val posPlan = posQ.queryExecution.optimizedPlan.toString
    // rewritten: filter over index-tagged structs inside the array
    assert(posPlan.contains("lambdafunction") && posPlan.contains("transform("),
      s"expected tagged-struct pushdown in:\n$posPlan")
    // pos must reflect PRE-filter positions (the raw-array rewrite would
    // renumber: id 1's second b sits at pos 3, not 1)
    assert(posQ.select("pos").as[Int].collect().sorted.toSeq ==
      Seq(0, 1, 1, 1, 3))
    assert(posQ.select("id", "pos", "col").collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq ==
      Seq((1L, 1, "b"), (1L, 3, "b"), (2L, 0, "b"), (2L, 1, "b"), (5L, 1, "b")))
    // parity with the rule disabled
    val run = () => df.select(col("id"), posexplode(col("arr")))
      .filter(col("col").isin("a", "b"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val withRule = run()
    val prev = spark.conf.getOption("spark.sql.optimizer.excludedRules")
    spark.conf.set("spark.sql.optimizer.excludedRules", ruleName)
    try assert(run() == withRule && withRule.nonEmpty)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.optimizer.excludedRules", v)
      case None => spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }

  test("posexplode predicates touching pos stay above; value part still pushes") {
    val q = df.select(col("id"), posexplode(col("arr")))
      .filter(col("col") === "b" && col("pos") > 0)
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("lambdafunction"), s"value conjunct should push:\n$opt")
    assert(q.select("id", "pos").collect().map(r =>
      (r.getLong(0), r.getInt(1))).sorted.toSeq ==
      Seq((1L, 1), (1L, 3), (2L, 1), (5L, 1)))
  }

  test("non-deterministic predicates stay above the generate") {
    val q = df.select(col("id"), explode(col("arr")).as("t"))
      .filter(rand(7) >= 0.0 && col("t") === "b")
    // rand() blocks whole-condition pushdown of itself; the element
    // conjunct may still push, but never the non-deterministic one.
    // (Catalyst keeps non-deterministic conjuncts ordered, so assert
    // only that results are sane.)
    assert(q.count() == 5L)
  }
}

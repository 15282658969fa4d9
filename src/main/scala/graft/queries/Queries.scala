package graft.queries

import graft.core.{Address, Tables, User}
import graft.ext.{Bpe, Chunking, Dedup, Drift, Dsir, Graph, MultiModal, Packing, Retrieval, Sampling, Similarity, Sketches, TextAnalysis}
import graft.operators.{AsofJoin, EnrichmentJoin, Envelope, Skew, WindowCounts}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The engine's query surface over the driver test corpus (TESTDATA.md),
  * with a DuckDB oracle statement per query (where ANSI-expressible).
  *
  * Cross-engine exactness rules used throughout (so the driver's hash
  * compare is bit-stable, not approximately-equal):
  *  - money sums go through DECIMAL(18,2) and back to DOUBLE — decimal
  *    addition is exact and order-independent, and the final decimal→double
  *    cast rounds identically in both engines;
  *  - epoch-nanos arithmetic stays integral (DIV) — ns values exceed
  *    double's 2^53 mantissa;
  *  - DuckDB SUM over integers returns HUGEINT → always CAST ... AS BIGINT
  *    to match Spark's long;
  *  - every aggregate/computed column is aliased identically on both sides.
  */
object Queries {

  private def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Scratch path for a query's materialized index artifact (the q61/q68/
    * q76/q98 build-once tables). Keyed on the SANITIZED FULL corpus path
    * (two dirs can collide on hashCode) plus the application id, so
    * concurrent runs against the same corpus never overwrite each other's
    * artifact mid-read.
    */
  private def scratchPath(spark: SparkSession, tag: String, dir: String): String = {
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val app = spark.sparkContext.applicationId
    s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_${safe}_$app"
  }
  private def msum(c: Column): Column = sum(money(c)).cast("double")
  /** For PRODUCTS of 2-decimal values: the exact result has 4 decimals, so
    * a DECIMAL(18,4) cast sits exactly on the grid — no engine ever rounds
    * at a half-point (a 2-decimal cast would: Java's shortest-repr
    * BigDecimal rounds x.xx5 HALF_UP while DuckDB rounds the raw binary,
    * and they disagree).
    */
  private def msum4(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  // ------------------------------------------------------------------
  // Relational core (operator breadth over the TPC-H-ish corpus)
  // ------------------------------------------------------------------

  /** TPC-H Q1-style pricing summary: filter → hash agg, fully pushed down. */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        msum(col("l_quantity")).as("sum_qty"),
        msum(col("l_extendedprice")).as("sum_base_price"),
        msum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("cnt"))

  /** Predicate + projection pushdown to the parquet scan. */
  def q02FilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  /** Broadcast join (customer is the small dim) + aggregation. */
  def q03JoinAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .join(broadcast(Tables.load(spark, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), msum(col("o_totalprice")).as("sum_price"))

  /** Multiway star join: fact lineitem joined up the dims to region. */
  def q04MultiwayRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.load(spark, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.load(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.load(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        msum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))

  /** Top-k with deterministic tie-break: TakeOrderedAndProject, no full sort. */
  def q05TopOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** Distinct (shuffle-dedup) over a two-column projection. */
  def q06Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"))
      .distinct()

  /** Ranking window function: best order per customer. */
  def q07WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.load(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
  }

  /** Left-semi join: orders with at least one returned lineitem. */
  def q08SemiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .join(
        Tables.load(spark, dir, "lineitem").filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_totalprice"))

  /** Left-anti join: customers that never ordered. */
  def q09AntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .join(Tables.load(spark, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Set operation: distinct union of customer and supplier nations. */
  def q10SetOps(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .union(Tables.load(spark, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .distinct()

  /** Rollup (grouping-set hierarchy) with exact money sums. */
  def q11Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), msum(col("l_quantity")).as("sum_qty"))

  /** Scalar string/math function coverage on part. */
  def q12ScalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part")
      .select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 10)).as("name10"),
        length(col("p_name")).as("name_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        (col("p_size") * 2 + 1).as("size_calc"))

  /** Date-part extraction + monthly aggregation. */
  def q13DateParts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n_orders"), msum(col("o_totalprice")).as("sum_price"))

  /** Conditional aggregation (CASE WHEN inside agg). */
  def q14CaseAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
        count(lit(1)).as("cnt"))

  // ------------------------------------------------------------------
  // Streaming-semantics analogs over the events table
  // ------------------------------------------------------------------

  /** W1/A1 analog: tumbling 1-minute processing-time counts (SURVEY §2 W1),
    * keyed — the fully parallel replacement for the reference's
    * parallelism-1 `windowAll` (`Main.java:137`).
    */
  def q15EventMinuteCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(spark, dir)
      .groupBy(
        expr("ts_ns DIV 60000000000").as("epoch_min"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** S1–S3 analog: last-write-wins upsert materialization — latest event
    * per user (SURVEY §2.2 sink contract as a batch query).
    */
  def q16LatestPerUser(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns").desc, col("event_id").desc)
    Tables.loadEvents(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
  }

  /** J1: the REAL cumulative-snapshot enrichment join (EnrichmentJoin, the
    * reference's `Main.java:78-133` semantics) run in batch over a
    * users/addresses stream synthesized from customer/orders, then reduced
    * to per-user emission statistics that a closed-form oracle can check:
    * a user with c addresses emits 1+c snapshots carrying c(c+1)/2 address
    * rows in total — exactly the §2.1 over-counting contract.
    */
  def q17J1Snapshots(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixedTs = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val users = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").cast("string").as("id"), col("c_name").as("name"))
      .as[(String, String)]
      .map { case (id, name) =>
        Envelope(id, 0L, Some(User(id, name, s"$name@example.com", "O", fixedTs)), None)
      }
    val addrs = Tables.load(spark, dir, "orders")
      .select(col("o_custkey").cast("string"), col("o_orderkey"),
        col("o_orderstatus"), col("o_orderpriority"))
      .as[(String, Long, String, String)]
      .map { case (uid, ok, status, prio) =>
        Envelope(uid, ok,
          None, Some(Address(uid, s"addr-$ok", "city", prio, "00000", status)))
      }
    EnrichmentJoin.joinBatch(spark, users.unionByName(addrs)).toDF()
      .groupBy(col("user.id").cast("long").as("user_id"))
      .agg(
        count(lit(1)).as("n_snapshots"),
        sum(size(col("addresses"))).as("n_addr_rows_emitted"),
        max(size(col("addresses"))).cast("long").as("n_addresses_final"))
  }

  /** W1/A1: the REAL WindowCounts operator (tumbling window + keyed count)
    * in batch, over snapshots synthesized from orders (one address per
    * snapshot, procTime = order date, 1-day windows so sf-independent).
    */
  def q18WindowCounts(spark: SparkSession, dir: String): DataFrame = {
    val snapshots = Tables.load(spark, dir, "orders").select(
      col("o_orderdate").as("procTime"),
      array(struct(
        col("o_orderstatus").as("address"),
        lit("city").as("city"),
        col("o_orderpriority").as("state"),
        lit("00000").as("zipCode"),
        col("o_orderstatus").as("country"))).as("addresses"))
    WindowCounts.countByState(snapshots, windowLength = "1 day")
      .select(
        // driver parquet timestamps are NTZ; interpret as UTC for epoch
        col("window_start").cast("timestamp").cast("long").as("window_start_sec"),
        col("state"), col("count").as("cnt"))
  }

  /** W2/A2: the country-keyed variant of q18 through the REAL
    * `WindowCounts.countByCountry` path — same parameterized operator, but
    * this row exercises the country key end-to-end against the oracle
    * (`Main.java:153-167`).
    */
  def q59WindowCountsCountry(spark: SparkSession, dir: String): DataFrame = {
    val snapshots = Tables.load(spark, dir, "orders").select(
      col("o_orderdate").as("procTime"),
      array(struct(
        col("o_orderstatus").as("address"),
        lit("city").as("city"),
        col("o_orderpriority").as("state"),
        lit("00000").as("zipCode"),
        col("o_orderstatus").as("country"))).as("addresses"))
    WindowCounts.countByCountry(snapshots, windowLength = "1 day")
      .select(
        col("window_start").cast("timestamp").cast("long").as("window_start_sec"),
        col("country"), col("count").as("cnt"))
  }

  /** C3 analog: rename/flatten document projection through a dim join. */
  def q19DocumentProjection(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .join(broadcast(Tables.load(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(
        col("c_custkey").as("userId"),
        col("c_name").as("userName"),
        col("c_mktsegment").as("genre"),
        col("n_name").as("country"))

  // ------------------------------------------------------------------
  // Training-data pipeline: dedup / text / similarity / multimodal
  // ------------------------------------------------------------------

  /** Exact dedup groups by normalized md5 fingerprint. */
  def q20DedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactDupGroups(Tables.load(spark, dir, "documents"))

  /** Per-document text statistics. */
  def q21TextStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_calc"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))

  /** Corpus language/source statistics. */
  def q22LangStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))

  /** Language-ID by marker-token voting (TextAnalysis.langId). */
  def q23LangId(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))

  /** Quality scoring (composite heuristic). */
  def q24Quality(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))

  /** Exact brute-force ANN: top-10 by cosine against the vec_id=0 vector. */
  def q25AnnTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val qv = Similarity.probeVector(emb)
    Similarity.bruteForceTopK(emb, qv, 10).select(col("vec_id"))
  }

  /** Embedding corpus stats (schema/shape validation at scale). */
  def q26EmbeddingStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        max(size(col("embedding"))).cast("long").as("dim"),
        min(col("vec_id")).as("min_id"))

  /** Token-count with subword heuristic (regex class splits). */
  def q27SubwordCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        TextAnalysis.subwordCount(col("text")).cast("long").as("n_subwords"))

  /** Events: JSON property extraction (D1/D2 JSON-parsing analog). */
  def q28EventProps(spark: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"))

  /** Sessionization: 30-minute-gap sessions per user (stateful-processing
    * analog expressible for the oracle via lag()).
    */
  def q29Sessions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    Tables.loadEvents(spark, dir)
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ns").isNull ||
          col("ts_ns") - col("prev_ns") > 1800000000000L, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** D1: the real wire-format JSON parse (Schemas.parseUsers) over user
    * records synthesized from customer — round-trips the producer's
    * timestamp format (`user-generator.py:22`) and projects typed fields
    * the oracle reproduces directly from the base table.
    */
  def q36D1Parse(spark: SparkSession, dir: String): DataFrame = {
    val wire = Tables.load(spark, dir, "customer").select(
      to_json(struct(
        col("c_custkey").cast("string").as("id"),
        col("c_name").as("name"),
        concat(col("c_name"), lit("@example.org")).as("email"),
        col("c_mktsegment").as("genre"),
        lit("2024-03-05T06:07:08.123456+0000").as("registerDate"))).as("value"))
    graft.core.Schemas.parseUsers(wire).toDF()
      .select(
        col("id").cast("long").as("userId"),
        col("name"),
        col("email"),
        col("genre"),
        col("registerDate").cast("long").as("register_epoch"))
  }

  /** Skew-salted two-phase aggregation — result identical to a plain
    * groupBy count (the oracle), physical work balanced across salts.
    */
  def q37SaltedCount(spark: SparkSession, dir: String): DataFrame =
    Skew.saltedCount(Tables.load(spark, dir, "lineitem"), Seq("l_returnflag"))

  /** Distinct aggregation (COUNT DISTINCT inside groupBy). */
  def q38DistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("cnt"))

  /** Cube grouping sets over two dimensions. */
  def q39Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), msum(col("l_quantity")).as("sum_qty"))

  /** Backward as-of join (point-in-time): for each order, the customer's
    * latest event at-or-before the order date.
    */
  def q40AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .withColumn("o_ns",
        col("o_orderdate").cast("timestamp").cast("long") * lit(1000000000L))
    val events = Tables.loadEvents(spark, dir)
    AsofJoin.backward(orders, events, "o_custkey", "user_id", "o_ns", "ts_ns")
      .select(col("o_orderkey"), col("asof_ts").as("last_event_ns"))
  }

  /** The spark.sql(...) entry path: identical semantics are reachable via
    * registered views + ANSI SQL (Catalyst plans both identically).
    */
  def q41SqlApi(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders_v")
    Tables.load(spark, dir, "customer").createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT c_mktsegment, COUNT(*) AS n_open,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS open_total
         FROM orders_v JOIN customer_v ON o_custkey = c_custkey
         WHERE o_orderstatus = 'O'
         GROUP BY c_mktsegment""")
  }

  /** Analytic window-function battery: lag/lead/rank/dense_rank/ntile over
    * per-customer order sequences (all-integer outputs → hash-exact).
    */
  def q43Analytics(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.load(spark, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"))
  }

  /** Full outer join with null-handling: per-nation customer and supplier
    * counts merged, absent sides coalesced to zero.
    */
  def q44FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val s = Tables.load(spark, dir, "supplier")
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(s, Seq("nationkey"), "full_outer")
      .select(
        col("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
  }

  /** Spark 4 VARIANT path for semi-structured props: parse once to the
    * binary variant encoding, extract typed fields — the scale-path
    * replacement for per-access string re-parsing (`get_json_object`).
    */
  def q45VariantProps(spark: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(spark, dir)
      .select(
        variant_get(parse_json(col("props")), "$.k", "bigint").as("k"),
        col("value"))
      .groupBy(col("k"))
      .agg(
        count(lit(1)).as("cnt"),
        msum(col("value")).as("sum_value"))

  /** Exact linear-interpolation percentiles per group. The p50/p90 of
    * 2-decimal money at those fractions are exact 3-decimal rationals, so
    * round(4) is engine-stable.
    */
  def q46Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        count(lit(1)).as("cnt"))

  /** Pivot (columns from values): order counts per priority × status. */
  def q47Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()

  /** Regex function battery: extract / replace / match over part names. */
  def q48RegexFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part")
      .select(
        col("p_partkey"),
        regexp_extract(col("p_type"), "^([A-Z]+)", 1).as("first_word"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        col("p_type").rlike("STEEL|BRASS").cast("int").as("is_metal"))

  /** Ordered string aggregation per group (collect_list → sort → join —
    * the deterministic formulation of string_agg).
    */
  def q49StringAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "supplier")
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(array_join(array_sort(collect_list(col("s_name"))), "|").as("names"))

  /** The custom typed Aggregator (VectorMeanAggregator) through the gate:
    * per-label centroid, exploded to scalar rows. Float means are not
    * bit-portable across engines, so values are rounded to 4 decimals
    * (double-accumulated means of ~unit floats are identical far beyond
    * that precision).
    */
  def q50Centroids(spark: SparkSession, dir: String): DataFrame = {
    val centroid = udaf(graft.functions.VectorMeanAggregator)
    Tables.load(spark, dir, "embeddings")
      .groupBy(col("label"))
      .agg(centroid(col("embedding")).as("c"))
      .select(col("label"), posexplode(col("c")).as(Seq("pos", "v")))
      .select(col("label"), col("pos"), round(col("v").cast("double"), 4).as("m4"))
  }

  /** Range join (equi key + time-range residual): events within 7 days
    * after the order date, for a keyed subset of orders. The equi key keeps
    * the physical plan a hash join with a residual filter — never a
    * nested-loop cross product.
    */
  def q51RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") % 97 === 0)
      .withColumn("o_ns", col("o_orderdate").cast("timestamp").cast("long") * lit(1000000000L))
    val events = Tables.loadEvents(spark, dir)
    orders.join(events,
      orders("o_custkey") === events("user_id") &&
        events("ts_ns") >= orders("o_ns") &&
        events("ts_ns") < orders("o_ns") + lit(7L * 86400L * 1000000000L))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_events"), max(col("ts_ns")).as("max_ns"))
  }

  /** Set-op coverage beyond union: intersect and except (distinct). */
  def q52ExceptIntersect(spark: SparkSession, dir: String): DataFrame = {
    val custN = Tables.load(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val suppN = Tables.load(spark, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    custN.intersect(suppN).withColumn("op", lit("both"))
      .unionByName(custN.except(suppN).withColumn("op", lit("cust_only")))
  }

  /** Corpus document-frequency statistics (the exact-integer core of
    * TF-IDF): distinct-per-doc tokens → doc counts → deterministic top-20.
    */
  def q53DocFreq(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(explode(array_distinct(TextAnalysis.tokens(lower(col("text"))))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term").asc)
      .limit(20)

  /** Explicit GROUPING SETS through the SQL API (beyond rollup/cube). */
  def q54GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem_v
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""")
  }

  /** Null-handling scalar battery: coalesce / nullif / least / greatest /
    * conditional over exact types.
    */
  def q55ScalarNull(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("X")).as("flag_or_x"),
        least(col("l_linenumber"), lit(3)).as("ln3"),
        greatest(col("l_quantity").cast("long"), lit(25L)).as("q25"),
        when(col("l_discount") > 0.05, "HI").otherwise("LO").as("disc_band"))

  /** Native session windows (gaps-and-islands with a 30-minute gap) via
    * Spark's `session_window` — the streaming-capable session operator; the
    * oracle replays it with the LAG/cumulative-sum island technique.
    */
  def q56SessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(spark, dir)
      .withColumn("ts_m", timestamp_micros(expr("ts_ns DIV 1000")))
      .groupBy(col("user_id"), session_window(col("ts_m"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        col("cnt"))

  /** Sliding (overlapping) windows: 10-minute length, 5-minute slide —
    * every event lands in exactly two windows; the oracle unrolls the
    * window assignment arithmetic.
    */
  def q57SlidingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(spark, dir)
      .withColumn("ts_m", timestamp_micros(expr("ts_ns DIV 1000")))
      .groupBy(
        window(col("ts_m"), "10 minutes", "5 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"),
        col("cnt"))

  /** max_by/min_by-style aggregates with deterministic tie-break via
    * lexicographic struct ordering (the portable formulation of arg-max).
    */
  def q58MinMaxBy(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        max(struct(col("o_totalprice"), col("o_orderkey")))
          .getField("o_orderkey").as("top_order"),
        min(struct(col("o_totalprice"), col("o_orderkey")))
          .getField("o_orderkey").as("bottom_order"),
        count(lit(1)).as("cnt"))

  // ---- formerly no-oracle: now fully replayed by DuckDB via the md5-based
  // portable hash family (same LSH/banding structure; only the hash
  // primitive changed from xxhash64 to md5-60) ----

  /** MinHash/LSH near-dup candidate pairs (band-bucketed, never all-pairs). */
  def q30MinHashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.verifiedNearDups(Tables.load(spark, dir, "documents"), threshold = 0.5)

  /** SimHash near-dup pairs (prefix-bucketed). */
  def q31SimHashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simHashPairs(Tables.load(spark, dir, "documents"), maxHamming = 16)

  /** Embedding cosine near-dup pairs (hyperplane-LSH bucketed). */
  def q32CosineNearDups(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(Tables.load(spark, dir, "embeddings"),
      threshold = 0.3)

  /** IVF-bucketed approximate top-k (scale path of q25). */
  def q33IvfTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val centroids = Similarity.sampleCentroids(emb, m = 8)
    val qv = Similarity.probeVector(emb)
    Similarity.ivfTopK(Similarity.assignBuckets(emb, centroids), centroids, qv,
      k = 10, nprobe = 3).select(col("vec_id"))
  }

  /** The physically bucketed IVF scale path of q33: embeddings are written
    * once as a parquet table partitioned by coarse bucket, and the probe's
    * `bucket IN (...)` becomes a PARTITION filter — the scan touches only
    * nprobe directories instead of post-filtering a full-corpus read. Same
    * algorithm, same oracle as q33; the index build is part of the query
    * here for gate self-containment, but at scale it's a build-once
    * artifact amortized over the query workload.
    */
  def q61IvfIndexed(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val centroids = Similarity.sampleCentroids(emb, m = 8)
    val qv = Similarity.probeVector(emb)
    val idx = scratchPath(spark, "ivf", dir)
    Similarity.writeIvfIndex(emb, centroids, idx)
    Similarity.ivfTopKIndexed(spark, idx, centroids, qv, k = 10, nprobe = 3)
      .select(col("vec_id"))
  }

  /** SQ8 scale path of the physical IVF index (q61): the index stores
    * int8-quantized vectors (4× less IO) and scores them directly —
    * cosine is scale-invariant, so no per-row dequantization (see
    * `Similarity.writeIvfIndexSQ8`). Approximate only by the quantization,
    * deterministic given the corpus, and replayed exactly by the oracle.
    */
  def q68IvfSq8(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val centroids = Similarity.sampleCentroids(emb, m = 8)
    val qv = Similarity.probeVector(emb)
    val idx = scratchPath(spark, "ivfsq8", dir)
    Similarity.writeIvfIndexSQ8(emb, centroids, idx)
    Similarity.ivfTopKSQ8(spark, idx, centroids, qv, k = 10, nprobe = 3)
      .select(col("vec_id"))
  }

  /** Multimodal: REAL decode-based feature extraction
    * ([[graft.ext.MultiModal.extractImageFeatures]] — the round-12
    * replacement of the formerly-stubbed byte histogram): every doc id's
    * deterministic solid-color PNG is decoded and summarized into a
    * dense feature vector (dims, band count, [0,1]-normalized channel
    * means). PNG is lossless and the fixture is closed-form in the id,
    * so the oracle predicts every feature exactly — a real
    * encode→decode→featurize round-trip, graded end to end.
    */
  def q34MediaFeatures(spark: SparkSession, dir: String): DataFrame =
    MultiModal.extractImageFeatures(
      MultiModal.syntheticPngMedia(Tables.load(spark, dir, "documents")))
      .select(
        col("media_id"),
        element_at(col("features"), 1).cast("int").as("width"),
        element_at(col("features"), 2).cast("int").as("height"),
        element_at(col("features"), 3).cast("int").as("bands"),
        round(element_at(col("features"), 4), 6).as("f_r"),
        round(element_at(col("features"), 5), 6).as("f_g"),
        round(element_at(col("features"), 6), 6).as("f_b"))

  /** End-to-end near-dup removal (keep-first over verified LSH pairs). */
  def q42DropNearDups(spark: SparkSession, dir: String): DataFrame =
    Dedup.dropNearDups(Tables.load(spark, dir, "documents"), threshold = 0.5)
      .select(col("doc_id"))

  /** Transitive (connected-components) near-dup removal — the opt-in
    * alternative to q42's single-pass keep-first policy: an a↔b↔c chain
    * keeps exactly one doc even when a↮c. The oracle replays the CC with a
    * recursive transitive-closure CTE over the same verified-pair graph.
    */
  def q60CcDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.dropNearDupsCC(Tables.load(spark, dir, "documents"), threshold = 0.5)
      .select(col("doc_id"))

  /** Leakage-safe 80/10/10 split (`Dedup.leakageSafeSplit`): the split
    * hashes each document's near-dup COMPONENT ROOT (same verified-pair
    * graph as q60), so transitive near-dup clusters land whole in one
    * split — the contamination defence a per-doc hash split can't give.
    * Oracle: q60's recursive-closure components + the q65 md5 decision
    * idiom on the root.
    */
  def q121LeakageSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    Dedup.leakageSafeSplit(docs,
      Dedup.verifiedNearDups(docs, threshold = 0.5)
        .select(col("id1"), col("id2")))
  }

  /** DSIR importance resampling (Xie et al., NeurIPS 2023): select 100
    * docs without replacement with probability ∝ the hashed-ngram
    * importance weight against the English slice as the target domain
    * ([[graft.ext.Dsir.resample]] — bag models in one conditional
    * aggregate, broadcast bucket table, Gumbel top-k selection keyed on
    * the md5 uniform so the oracle replays the draw exactly).
    */
  def q122DsirSample(spark: SparkSession, dir: String): DataFrame =
    Dsir.resample(Tables.load(spark, dir, "documents"),
      col("lang") === "en", k = 100, buckets = 1024)

  /** Tokenizer-fertility audit per source — the "is this tokenizer fit
    * for this corpus slice" scorecard (fertility = BPE tokens per word,
    * compression = chars per BPE token, OOV-word rate), computed from
    * the q112 encode under the 80%-split-trained 12-merge model. The
    * encode is scan-shaped (broadcast vocab join); the audit adds one
    * #sources-row aggregate on top. Oracle: the q112 merge-replay CTE
    * chain with a per-source final aggregate.
    */
  def q123FertilityAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val (merges, vocab) = Bpe.train(
      docs.filter(col("doc_id") % 10 < 8), nMerges = 12)
    Bpe.encodeCorpus(docs, merges, vocab)
      .join(docs.select(col("doc_id"), col("source"), col("n_chars")),
        Seq("doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"),
        round(sum(col("n_bpe_tokens")).cast("double") /
          sum(col("n_words")).cast("double"), 6).as("fertility"),
        round(sum(col("n_chars")).cast("double") /
          sum(col("n_bpe_tokens")).cast("double"), 6).as("chars_per_token"),
        round(sum(col("n_oov_words")).cast("double") /
          sum(col("n_words")).cast("double"), 6).as("oov_rate"))
  }

  /** Cross-source near-dup overlap matrix — which source pairs share
    * near-duplicate content (the near-dup counterpart of q95's exact
    * overlap): verified MinHash/LSH pairs at Jaccard ≥ 0.5 rolled up to
    * unordered (src_a, src_b) cells with pair count and mean verified
    * Jaccard. The matrix is the standard cross-contamination audit run
    * before mixing sources into a training corpus. Physical shape: the
    * q30 pair pipeline (bucketed candidates + verify joins) plus two
    * broadcastable id→source joins and a #sources²-bounded aggregate.
    */
  def q124CrossdupMatrix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val src = docs.select(col("doc_id"), col("source"))
    Dedup.verifiedNearDups(docs, threshold = 0.5)
      .join(src.select(col("doc_id").as("id1"), col("source").as("_s1")), Seq("id1"))
      .join(src.select(col("doc_id").as("id2"), col("source").as("_s2")), Seq("id2"))
      .groupBy(least(col("_s1"), col("_s2")).as("src_a"),
        greatest(col("_s1"), col("_s2")).as("src_b"))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(col("jaccard")), 6).as("avg_jaccard"))
  }

  /** Intra-document de-repetition: cut repeated word 5-grams within each
    * doc, keeping the first occurrence
    * ([[graft.ext.TextAnalysis.scrubRepeatedNgrams]] — the rewrite
    * counterpart of q69's repetition signals, covering the pasted-
    * paragraph failure mode that cross-doc dedup (q115) and df-based
    * boilerplate scrubbing (q96) both miss by construction).
    */
  def q126RepetitionScrub(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.scrubRepeatedNgrams(
      Tables.load(spark, dir, "documents"), n = 5)

  /** Token-budget epoch plan (the data-constrained-scaling audit of
    * Muennighoff et al. 2023): given a total training budget of 2× the
    * corpus' whitespace tokens and a temperature-0.5 mixture over
    * sources, how many epochs (repeats) of each source does its share
    * require, and which sources cross the ~4-epoch mark past which
    * repeated data stops paying. One #sources-row aggregate + a scalar
    * cross — a planning table, not a resample (q71 does the resample).
    */
  def q125EpochPlan(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val perSrc = docs.groupBy(col("source"))
      .agg(sum(size(TextAnalysis.tokens(col("text")))).as("avail_tokens"))
    val totals = perSrc.agg(
      sum(col("avail_tokens")).as("_tot"),
      sum(sqrt(col("avail_tokens").cast("double"))).as("_wtot"))
    perSrc.crossJoin(broadcast(totals))
      .select(col("source"), col("avail_tokens"),
        round(sqrt(col("avail_tokens").cast("double")) / col("_wtot"), 6)
          .as("mix_weight"),
        round(lit(2.0) * col("_tot") *
          sqrt(col("avail_tokens").cast("double")) / col("_wtot"), 2)
          .as("target_tokens"),
        round(lit(2.0) * col("_tot") *
          sqrt(col("avail_tokens").cast("double")) /
          (col("_wtot") * col("avail_tokens").cast("double")), 6).as("epochs"),
        (lit(2.0) * col("_tot") *
          sqrt(col("avail_tokens").cast("double")) /
          (col("_wtot") * col("avail_tokens").cast("double")) > lit(4.0))
          .as("over_repeat_cliff"))
  }

  /** Rolling-hash document fingerprints (order-sensitive). */
  def q35RollingHash(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.rollingHash(col("text")).as("rhash"))

  /** End-to-end training-corpus curation — the composite pipeline a real
    * data-curation job runs, as ONE declarative plan Catalyst optimizes
    * whole: exact dedup (min-id per fingerprint) → language-ID gate →
    * quality-score gate → near-dup drop (MinHash/LSH keep-first) → per-doc
    * token stats. Each stage is an already-oracle-checked primitive (q20,
    * q23, q24, q42); this query pins their COMPOSITION and its physical
    * shape (see the staging comments in the body: tokenize-once features,
    * window-barrier gating, exchange reuse across the near-dup branches).
    */
  def q62CorpusCuration(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    // Stage order is the 100 TB order: exact dedup FIRST (one cheap
    // md5-keyed shuffle), gates after — the expensive scoring then runs
    // once per unique doc, not per raw doc. Physically the ordering also
    // places every feature expression BELOW the window exchange: tokenize
    // once (`ltoks`/`toks` computed a single time per row, shared by
    // langid + stopword + count), and the gate filter above the Window
    // reads the materialized columns instead of re-expanding the regex
    // chain (Catalyst can't push a non-partition-key filter through a
    // Window). That exchange is then reused by every near-dup branch
    // (ReusedExchange), so the whole prefix executes exactly once.
    val featured = docs
      .select(col("doc_id"), col("text"),
        TextAnalysis.tokens(lower(col("text"))).as("ltoks"),
        TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("text"),
        TextAnalysis.langIdFromTokens(col("ltoks")).as("lang_pred"),
        TextAnalysis.qualityScoreFromTokens(col("text"), col("toks"), col("ltoks"))
          .as("quality"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"),
        size(col("toks")).cast("long").as("n_tokens"))
    val exact = featured
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("fingerprint").orderBy("doc_id")))
      .filter(col("rn") === 1 &&
        col("lang_pred") =!= "und" && col("quality") >= 0.5)
      // materialize the curated intermediate: per-branch column pruning
      // gives the near-dup branches non-identical exchanges (no
      // ReusedExchange), so without this the whole prefix re-executes per
      // branch. CacheManager dedupes by canonicalized plan, so repeated
      // invocations share one entry; at cluster scale this intermediate is
      // the curated-corpus table a real pipeline writes to storage.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Dedup.dropNearDups(exact, threshold = 0.5)
      .select("doc_id", "lang_pred", "quality", "n_tokens")
  }

  /** Train/eval decontamination report: every corpus doc sharing ≥3
    * distinct 3-gram shingles with a doc of the probe (pseudo-eval) set —
    * here the probe is every 50th document, standing in for a benchmark
    * suite. Exact shingle-equality join with a corpus-side document-
    * frequency cap (see `Dedup.contaminationPairs` for the scale
    * rationale).
    */
  def q64Contamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    Dedup.contaminationPairs(docs, docs.filter(col("doc_id") % 50 === 0),
      shingleN = 3, minShared = 3)
  }

  /** Deterministic per-language stratified sample — corpus rebalancing with
    * an md5-keyed keep decision that is stable across runs, engines, and
    * repartitionings (see `Sampling`). English is downsampled to 0.5,
    * French to 0.25, everything else kept at 0.8.
    */
  def q65StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    Sampling.stratifiedSample(
      docs.select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred")),
      col("lang_pred"),
      rates = Map("en" -> 0.5, "fr" -> 0.25),
      defaultRate = 0.8)
  }

  /** Top-3 characteristic terms per document by rational TF-IDF (the
    * log-free, oracle-exact formulation — see
    * `TextAnalysis.tfIdfTopTerms`).
    */
  def q66TfIdfTerms(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfIdfTopTerms(Tables.load(spark, dir, "documents"), k = 3)

  /** Concat-and-chunk sequence packing: each document's global token
    * offset and the 2048-token chunks it spans, via the distributed
    * two-phase prefix sum in `Packing` (no parallelism-1 window).
    */
  def q67PackChunks(spark: SparkSession, dir: String): DataFrame =
    Packing.packOffsets(
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
      capacity = 2048L)

  /** Symmetric int8 embedding quantization + reconstruction audit: scale,
    * exact integer norm of the quantized vector (order-independent, so the
    * oracle compare is exact), and the max absolute reconstruction error.
    * The 4× storage story for 100 TB of float32 embeddings; truncation
    * quantization keeps the oracle replay bit-exact (see
    * `Similarity.quantizeInt8`).
    */
  def q63QuantizeInt8(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    emb
      .select(col("vec_id"), col("embedding"),
        Similarity.quantizeInt8(col("embedding")).as("qz"))
      .select(col("vec_id"),
        round(col("qz.scale"), 6).as("scale"),
        aggregate(col("qz.q"), lit(0L),
          (acc, q) => acc + (q * q).cast("long")).as("qnorm2"),
        round(array_max(zip_with(col("embedding"), col("qz.q"),
          (v, q) => abs(v.cast("double") - q.cast("double") * col("qz.scale")))), 6)
          .as("max_err"))
  }

  /** Gopher-style repetition quality signals: top-word / top-bigram
    * fraction and distinct-token ratio per document, with the `repetitive`
    * flag at the corpus-splitting thresholds (see
    * `TextAnalysis.repetitionSignals`).
    */
  def q69RepetitionSignals(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionSignals(Tables.load(spark, dir, "documents"))

  /** Sliding-window RAG chunking: 32-token windows advancing by 24 (8-token
    * overlap); shuffle-free per-row generator (see `Chunking.chunkTokens`).
    */
  def q70DocChunks(spark: SparkSession, dir: String): DataFrame =
    Chunking.chunkTokens(Tables.load(spark, dir, "documents"),
      chunkSize = 32, stride = 24)

  /** Temperature-scaled language-mixture resampling (alpha = 0.5,
    * target volume 50%): low-resource languages keep a higher fraction
    * than the head language, with the per-stratum rate derived from the
    * corpus counts themselves (see `Sampling.temperatureResample`).
    */
  def q71MixtureResample(spark: SparkSession, dir: String): DataFrame =
    Sampling.temperatureResample(
      Tables.load(spark, dir, "documents"),
      col("lang"), alpha = 0.5, targetFrac = 0.5)
      .select(col("doc_id"), col("lang"), col("rate"))

  /** Reduced-space ANN: 64-d float embeddings projected to 16-d through
    * the md5-derived ±1 sign matrix, top-10 by reduced-space cosine
    * (see `Similarity.rprojTopK` — the JL-style cheap pre-ranking pass).
    */
  def q72RprojTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val qv = Similarity.probeVector(emb)
    Similarity.rprojTopK(emb, qv, k = 10, dimOut = 16).select(col("vec_id"))
  }

  /** Vocabulary coverage: terms ranked by corpus frequency with
    * cumulative token share, via the distributed two-phase prefix sum
    * (see `TextAnalysis.vocabCoverage` — no single-task global window).
    */
  def q73VocabCoverage(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabCoverage(Tables.load(spark, dir, "documents"))

  /** Quality-representative near-dup removal: connected components over
    * the verified-pair graph, keep each cluster's HIGHEST-quality doc
    * (ties → min id) instead of q60's min-id policy (see
    * `Dedup.keepBestByComponents`).
    */
  def q74CcBestKeep(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    Dedup.keepBestByComponents(docs,
      Dedup.verifiedNearDups(docs, threshold = 0.5).select(col("id1"), col("id2")),
      TextAnalysis.qualityScore(col("text")), pairsCanonical = true)
      .select(col("doc_id"))
  }

  /** Eval-set contamination report: per probe doc, the number of corpus
    * docs sharing ≥3 discriminative 3-gram shingles, the worst overlap,
    * and the contaminated flag — zero-hit probes included (see
    * `Dedup.contaminationReport`).
    */
  def q75ContaminationReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    Dedup.contaminationReport(docs, docs.filter(col("doc_id") % 50 === 0),
      shingleN = 3, minShared = 3)
  }

  /** Materialized rproj-index scale path of q72: reduced vectors written
    * once, probes scan 16 doubles per row instead of 64 floats — same
    * ranking, same oracle as q72 (the projection is deterministic, so
    * pre-materializing it cannot change scores).
    */
  def q76RprojIndexed(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val qv = Similarity.probeVector(emb)
    val idx = scratchPath(spark, "rproj", dir)
    Similarity.writeRprojIndex(emb, dimIn = qv.length, dimOut = 16, path = idx)
    Similarity.rprojTopKIndexed(spark, idx, qv, k = 10, dimOut = 16)
      .select(col("vec_id"))
  }

  /** MinHash estimator calibration: per candidate pair, the
    * signature-estimated Jaccard (what the streaming dedup path decides
    * on) against the exact shingle Jaccard (what the batch path verifies
    * with) — the k-sizing audit (see `Dedup.estimatorCalibration`).
    */
  def q77EstCalibration(spark: SparkSession, dir: String): DataFrame =
    Dedup.estimatorCalibration(Tables.load(spark, dir, "documents"))

  /** Recall@10 audit of the reduced-space ANN (q72) against the exact
    * full-dimension top-10 (q25) — the acceptance metric an ANN rollout
    * publishes before swapping the serving path. One row: overlap count
    * and recall fraction.
    */
  def q78RprojRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val qv = Similarity.probeVector(emb)
    val exact = Similarity.bruteForceTopK(emb, qv, 10).select(col("vec_id"))
    val approx = Similarity.rprojTopK(emb, qv, 10, dimOut = 16).select(col("vec_id"))
    exact.join(approx, "vec_id")
      .agg(count(lit(1)).as("n_hits"),
        round(count(lit(1)).cast("double") / lit(10.0), 6).as("recall"))
  }

  /** Packed-chunk manifest (the loader-side inverse of q67): per
    * 2048-token chunk, how many documents land in it and how many token
    * slots they fill (see `Packing.chunkManifest`).
    */
  def q79ChunkManifest(spark: SparkSession, dir: String): DataFrame =
    Packing.chunkManifest(
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
      capacity = 2048L)

  /** Rare-token (OOV-ish) ratio per document: fraction of tokens whose
    * corpus document-frequency is < 3 (see `TextAnalysis.rareTokenRatio`).
    */
  def q80RareTokenRatio(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.rareTokenRatio(Tables.load(spark, dir, "documents"))

  /** One-row corpus report card: document/token/vocabulary volumes,
    * exact-duplicate count, language spread — the summary a curation run
    * prints before and after each stage.
    */
  def q81CorpusSummary(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    docs
      .select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        countDistinct(col("fp")).as("n_unique_docs"),
        countDistinct(col("lang")).as("n_langs"),
        max(col("n_toks")).as("max_doc_tokens"))
  }

  /** Duplicate-cluster size histogram: families per exact-dup
    * multiplicity (see `Dedup.dupClusterHistogram`).
    */
  def q82DupHistogram(spark: SparkSession, dir: String): DataFrame =
    Dedup.dupClusterHistogram(Tables.load(spark, dir, "documents"))

  /** Per-source scorecard: volume, mean quality, mean length, and
    * unidentified-language count by source — the triage table a curation
    * team reads to decide which sources to keep, cap, or drop. Mean
    * quality goes through a DECIMAL(18,6) sum (quality is 6dp-rounded, so
    * the decimal is exact) to keep the cross-engine average bit-stable —
    * a raw double sum's order-dependent ULPs could flip the rounding.
    */
  def q83SourceScorecard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    docs
      .select(col("source"),
        TextAnalysis.qualityScore(col("text"))
          .cast("decimal(18,6)").as("q"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("nt"),
        (TextAnalysis.langId(col("text")) === "und").cast("long").as("und"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(sum(col("q")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("avg_quality"),
        round(sum(col("nt")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("avg_tokens"),
        sum(col("und")).as("n_und"))
  }

  /** Exact n-gram Jaccard near-dup pairs via the inverted shingle index —
    * the deterministic, exact-recall sibling of q30's MinHash banding (see
    * `Dedup.ngramJaccardPairs` for the Σ df² vs Σ bucket² scale trade).
    */
  def q84NgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.load(spark, dir, "documents"),
      threshold = 0.5)

  /** Sketch audit: HyperLogLog distinct counts and quantile-sketch medians
    * next to their exact counterparts, gated by tolerance booleans — the
    * acceptance check a 100 TB pipeline runs before swapping exact
    * `COUNT(DISTINCT)` (a full shuffle of every key) for a mergeable
    * constant-size sketch. Outputs only exact values and the pass/fail
    * gates, so the oracle is exact SQL; the sketch estimates are
    * deterministic for a fixed corpus (HLL++ and the Greenwald–Khanna
    * percentile sketch are hash/order-stable under Spark's sort-free
    * partial aggregation here), making the booleans replayable facts, not
    * flaky assertions. rsd=1% HLL vs a 5% gate, accuracy-10k GK vs a
    * ±1.0 gate on 1..50-valued quantities.
    */
  def q85SketchAudit(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        (abs(approx_count_distinct(col("l_orderkey"), 0.01) -
            countDistinct(col("l_orderkey"))).cast("double") <=
          countDistinct(col("l_orderkey")).cast("double") * 0.05)
          .as("hll_ok"),
        (abs(percentile_approx(col("l_quantity").cast("double"), lit(0.5),
            lit(10000)) -
          expr("percentile(CAST(l_quantity AS DOUBLE), 0.5)")) <= 1.0)
          .as("p50_ok"))

  /** q64's decontamination through the Bloom-prefiltered path: Spark's own
    * `BloomFilterAggregate`/`BloomFilterMightContain` machinery driven
    * explicitly, so the corpus scan drops non-candidate shingles against a
    * few-MB filter instead of broadcasting the probe shingle set (see
    * `Dedup.bloomContaminationPairs`). Output identical to q64 by
    * construction (the exact semi-join removes bloom false positives) —
    * and the oracle is the same exact SQL, which is precisely the point:
    * the sketch accelerates, it never changes the answer.
    */
  def q86BloomContamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    Dedup.bloomContaminationPairs(docs, docs.filter(col("doc_id") % 50 === 0),
      shingleN = 3, minShared = 3)
  }

  /** Heavy-hitter audit, completing the sketch family (q85 = HLL +
    * quantiles): the corpus's top-20 tokens by exact count, each gated by
    * whether a Count-Min sketch of the whole token stream reproduces its
    * count within the ε·N guarantee. CMS is the mergeable constant-size
    * structure a 100 TB pipeline uses for per-partition heavy-hitter
    * screening (counters sum, so partial sketches combine associatively —
    * `df.stat.countMinSketch` builds it distributed via treeAggregate);
    * the audit outputs only exact counts and the deterministic gate
    * (fixed seed ⇒ fixed hash family ⇒ replayable boolean), so the
    * oracle stays exact SQL. CMS never under-counts, so the gate is
    * `exact ≤ est ≤ exact + ε·N` with ε = 1e-3. The gate itself stays
    * DISTRIBUTED: the constant-size sketch is broadcast and each
    * executor evaluates `estimateCount` over its slice of the
    * heavy-hitter candidates — the shape that still works when the
    * candidate set is "every term over df 10k", not a top-20.
    */
  def q87HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.load(spark, dir, "documents")
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
    val eps = 1e-3
    val cms = toks.stat.countMinSketch("term", eps, 0.99, seed = 42)
    val slack = (eps * cms.totalCount()).ceil.toLong
    val sketchBytes = spark.sparkContext.broadcast(cms.toByteArray)
    toks.groupBy(col("term"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(20)
      .as[(String, Long)]
      .mapPartitions { it =>
        val sk = org.apache.spark.util.sketch.CountMinSketch
          .readFrom(sketchBytes.value)
        it.map { case (term, n) =>
          val est = sk.estimateCount(term)
          (term, n, est >= n && est <= n + slack)
        }
      }
      .toDF("term", "n", "cms_ok")
  }

  /** PII detection + redaction (emails / IPv4s / phone fragments). The
    * synthetic corpus carries no real PII, so the query PLANTS
    * deterministic PII derived from doc_id before scrubbing — both
    * engines construct the identical text, and the scrub path (pattern
    * counts + ordered redaction) is what's under oracle check. One
    * map-only projection; see `TextAnalysis.scrubPii`.
    */
  def q88PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val planted = docs.select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com from 10.0."),
        (col("doc_id") % 256).cast("string"),
        lit(".7 call 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text"))
    TextAnalysis.scrubPii(planted)
  }

  /** SemDeDup-style semantic near-dup pairs: coarse centroid clustering
    * (the IVF assignment of q33/q61) bounds the pairwise cosine to
    * within-cluster — the embedding-space dedup that catches template
    * rewrites exact/MinHash dedup misses (see
    * `Similarity.semanticDedupPairs`). Threshold 0.4 sits above the
    * corpus's 99.9th-percentile random-pair cosine (~0.38) but below its
    * max (~0.51), so the result exercises real decisions.
    *
    * Round-15 re-registration on DERIVED sizing (the q132/q158 pattern):
    * the quantizer is `indexParams(N).nlist` (⌈√N⌉) exact-Lloyd k-means
    * centroids ([[graft.ext.Similarity.kmeansCentroidsExact]], 2 rounds
    * — the engine-replayable build q158 oracle-proved), so cluster size
    * tracks √N and the within-cluster quadratic term stays ~N·√N at any
    * scale. The retired fixed m=8 registration was quadratic just under
    * the 10000 bucket cap at 30× and had its ENTIRE corpus silently
    * capped away at 100× (every 25k-vector bucket > cap → 5.6 s
    * computing nothing) — the cap-vacuous sweep row round 14 flagged.
    * q162 surfaces the cap/dropped-mass accounting for both sizings, per
    * the no-silent-caps rule.
    */
  def q89SemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val nlist = Similarity.indexParams(emb.count()).nlist
    val centroids = Similarity.kmeansCentroidsExact(emb, nlist, iters = 2)
    Similarity.semanticDedupPairs(emb, centroids, threshold = 0.4)
  }

  /** Incremental corpus-refresh admission: docs with doc_id % 5 == 0
    * stand in for today's crawl batch, the rest for the already-curated
    * history; a batch doc is admitted unless it near-dups (Jaccard ≥ 0.5)
    * a history doc or an earlier batch doc. History×history pairs are
    * never generated — the per-refresh work scales with the batch (see
    * `Dedup.incrementalDedupBatch`); the oracle replays the decision from
    * a whole-corpus pair table, which matches by construction.
    */
  def q90IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    Dedup.incrementalDedupBatch(
      docs.filter(col("doc_id") % 5 =!= 0),
      docs.filter(col("doc_id") % 5 === 0),
      threshold = 0.5)
      .select(col("doc_id"))
  }

  /** Quality-ordered corpus selection manifest: every doc's global rank
    * and cumulative token count under (quality DESC, doc_id) — the "take
    * the best documents until the token budget" curve a data-constrained
    * training run reads its cut line from. The global ordering runs on
    * the two-phase `PrefixSum` (range partition → parallel local
    * window → per-partition offsets), NOT a bare `Window.orderBy` — the
    * parallelism-1 trap this engine refuses everywhere. Quality is
    * 6dp-rounded on both engines, so the (quality, doc_id) total order
    * is replayed exactly by the oracle's plain window.
    *
    * Incremental form: the rank/cum columns are holistic (one insert
    * shifts every position below it), so the manifest is an EPOCH
    * artifact — recomputed per refresh, like the q98 df-snapshot. Budget
    * ADMISSION against a frozen epoch is still streaming-expressible,
    * because cum_tokens is monotone in the manifest order: the admitted
    * set is a prefix, and a prefix of a total order is exactly a
    * (quality, doc_id) lex-threshold gate — equivalence pinned in
    * SamplingSpec ("quality-budget admission equals the stateless
    * lex-gate").
    */
  def q91QualityBudget(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val feats = docs.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    graft.operators.PrefixSum.withGlobalCumSum(feats,
      Seq(col("quality").desc, col("doc_id").asc), col("n_tokens"),
      cumCol = "cum_tokens", rankCol = Some("global_rank"))
      .select(col("doc_id"), col("global_rank").cast("long").as("global_rank"),
        col("cum_tokens").cast("long").as("cum_tokens"))
  }

  /** Near-containment pairs (|A∩B| / min(|A|,|B|) ≥ 0.6): the
    * partial-duplication audit Jaccard structurally misses — a short doc
    * quoted whole inside a long one pairs here but never under a Jaccard
    * threshold (see `Dedup.containmentPairs`). Same exact posting-join
    * candidate machinery as q84; only the verification metric differs.
    */
  def q92ContainmentPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(Tables.load(spark, dir, "documents"),
      threshold = 0.6)

  /** REAL evenly-spaced frame sampling
    * ([[graft.ext.MultiModal.sampleVideoFrames]] — the round-12
    * replacement of the formerly-stubbed byte-slice chunk sampler): 4
    * evenly spaced frames of each doc id's deterministic animated GIF
    * are raster-decoded (first and last always included, non-sampled
    * frames never rasterized); solid frames palettize losslessly, so
    * the oracle predicts every sampled frame's index, dimensions, and
    * exact channel means from (id, frame) in closed form — the
    * fixed-budget preview/thumbnail access pattern, graded end to end
    * (q142's stride sampling is the keyframe pattern sibling).
    */
  def q93MediaFrames(spark: SparkSession, dir: String): DataFrame =
    MultiModal.sampleVideoFrames(
      MultiModal.syntheticGifMedia(Tables.load(spark, dir, "documents")),
      n = 4)

  /** Fuzzy entity-matching self-join: customer-name pairs within edit
    * distance 1, via deletion-neighborhood blocking + exact levenshtein
    * verification (see `FuzzyJoin`). The padded TPC-H names make this a
    * dense instance (every one-digit id substitution pairs), which is
    * exactly the stress the df-capped key join must absorb.
    */
  def q94FuzzyJoin(spark: SparkSession, dir: String): DataFrame =
    graft.operators.FuzzyJoin.selfJoinEditDistance1(
      Tables.load(spark, dir, "customer"), strCol = "c_name", idCol = "c_custkey")

  /** Cross-source duplication matrix: verified near-dup pair counts per
    * (source, source) cell — the provenance audit that tells a curation
    * team which sources mirror each other (high off-diagonal mass) vs
    * which self-duplicate (diagonal). Source pairs are ordered
    * lexicographically so each unordered cell appears once.
    */
  def q95SourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val src = docs.select(col("doc_id"), col("source"))
    Dedup.verifiedNearDups(docs, threshold = 0.5)
      .join(src.select(col("doc_id").as("id1"), col("source").as("s1")), "id1")
      .join(src.select(col("doc_id").as("id2"), col("source").as("s2")), "id2")
      .select(least(col("s1"), col("s2")).as("source_a"),
        greatest(col("s1"), col("s2")).as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Corpus-global boilerplate scrub: non-overlapping 2-token segments,
    * segments present in >5% of documents stripped, text reassembled in
    * order (see `TextAnalysis.scrubBoilerplate`). The relative df
    * threshold makes the selectivity scale-invariant — the same config is
    * meaningful at sf0.01 and at 100 TB.
    */
  def q96BoilerplateScrub(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.scrubBoilerplate(Tables.load(spark, dir, "documents"),
      segTokens = 2, maxDfFrac = 0.05)

  /** Event-sequence transition matrix: per-user event streams ordered by
    * (ts, event_id), counted by (previous type → type) — the Markov
    * bigram over behavioral sequences (funnel/anomaly analytics). One
    * shuffle to co-locate each user's history, per-user lag window (no
    * global window), one map-side-combined count aggregate.
    */
  def q97EventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    Tables.loadEvents(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_ns"), col("event_type"))
      .withColumn("src_type", lag(col("event_type"), 1).over(w))
      .filter(col("src_type").isNotNull)
      .groupBy(col("src_type"), col("event_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .select(col("src_type"), col("event_type").as("dst_type"),
        col("n_transitions"))
  }

  /** Incremental boilerplate scrub — the production refresh path of q96:
    * the segment-df table is computed once over the full corpus (in a
    * real deployment, materialized from history) and a new batch (docs
    * with id % 10 == 0 here) is scrubbed against it, so per-batch work
    * scales with the batch, not the corpus (see
    * `TextAnalysis.scrubBoilerplateAgainst`).
    */
  def q98IncrementalScrub(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    // materialize the history segment-df once (the corpus-snapshot
    // artifact a production refresh reads), then scrub the batch against
    // the read-back table — same pattern as the q61/q76 indexed variants
    val idx = scratchPath(spark, "segdf", dir)
    TextAnalysis.segmentDf(docs, segTokens = 2).write.mode("overwrite").parquet(idx)
    TextAnalysis.scrubBoilerplateAgainst(
      docs.filter(col("doc_id") % 10 === 0),
      spark.read.parquet(idx),
      docs.agg(count(lit(1)).as("n_docs")),
      segTokens = 2, maxDfFrac = 0.05)
  }

  /** Per-source adaptive quality gate: within each source keep the top
    * 50% of documents by quality score (ceil(frac·n) rows, integer cut —
    * see `Sampling.topFractionByStratum`). The dynamic per-source
    * threshold replaces a single global cutoff: noisy sources keep only
    * their best slice with no hand-tuned per-source constant. The gate
    * is holistic (rank within the stratum), so its streaming form is the
    * q96→q98 decomposition: freeze `Sampling.stratumThresholds` on a
    * refresh cadence and admit arriving rows statelessly via
    * `Sampling.gateAgainstThresholds` (parity pinned in SamplingSpec).
    */
  def q99AdaptiveGate(spark: SparkSession, dir: String): DataFrame =
    Sampling.topFractionByStratum(
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextAnalysis.qualityScore(col("text")).as("quality")),
      col("source"), col("quality"), frac = 0.5)

  /** Shuffled export manifest: deterministic pseudo-random training order
    * (salted md5 of the id), global position/offset on the distributed
    * prefix sum, token-balanced shard assignment (see
    * `Packing.shuffledExportManifest`) — the manifest a training run's
    * data loader streams shards from.
    */
  def q100ShuffledExport(spark: SparkSession, dir: String): DataFrame =
    Packing.shuffledExportManifest(
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
      shardTokens = 4096L)

  /** Z-order (Morton) layout key over the fact table's two independent
    * join keys — the multi-dimensional clustering that lets min/max
    * footer stats prune scans filtered on EITHER key (see
    * `sources.Layout`: a one-key sort prunes one predicate; interleaved
    * bits give every file a small key-space rectangle). Pure integer
    * bit arithmetic, so any engine replays the key exactly.
    */
  def q101ZorderKey(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.sources.Layout.zorderKey2(
          col("l_partkey"), col("l_suppkey")).as("zkey"))

  /** Rank-quantile z-order key — the skew-robust variant of q101 for
    * wide/continuous domains (here: price × part key): each dimension is
    * exact-rank bucketed into 64 equi-depth ranks before the Morton
    * interleave, so file rectangles stay small in RANK space no matter
    * how the values are distributed (see `Layout.quantileBucket` — the
    * ranking runs over the value histogram through the distributed
    * two-phase prefix sum, no global single-task window, and the exact
    * integer arithmetic replays in any engine).
    */
  def q102ZorderQuantile(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Layout.withZorderKeyQuantile(
      Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_partkey")),
      "l_extendedprice", "l_partkey", bits = 6, zCol = "zq")
      .select(col("l_orderkey"), col("l_linenumber"), col("zq"))

  /** Exact-substring duplicate pairs — the character-level dedup family
    * (Lee et al. 2021): documents sharing ≥ 2 content-sampled 100-char
    * gram fingerprints (md5-60 ≡ 0 mod 4, per-fingerprint df ≤ 50; the
    * window length is sized in TOKENS ≈ the literature's ~50-BPE-token
    * run — see `charGramFingerprints`' scale note). Catches verbatim
    * reuse that word-shingle Jaccard structurally misses when the copied
    * run is a small slice of a long document; candidates come only from
    * the df-capped posting self-join on the 8-byte fingerprint — see
    * `Dedup.substringDupPairs`.
    */
  def q103SubstringPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.substringDupPairs(Tables.load(spark, dir, "documents"))

  /** Incremental exact-substring admission: batch docs (doc_id % 5 == 0)
    * admitted against the history corpus (the rest) — rejected on a
    * shared-fingerprint link to any history doc or an earlier batch doc.
    * Batch×history candidate generation only, never history×history (see
    * `Dedup.incrementalSubstringBatch`); the oracle replays the decision
    * from a whole-corpus pair table, which matches by construction.
    */
  def q107IncrementalSubstring(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    Dedup.incrementalSubstringBatch(
      docs.filter(col("doc_id") % 5 =!= 0),
      docs.filter(col("doc_id") % 5 === 0))
      .select(col("doc_id"))
  }

  /** CCNet-style model-based quality gate (the pipeline stage the
    * heuristic gates can't replace): an add-k word-bigram LM trained on
    * the trusted English slice (`TextAnalysis.trainBigramLm`), every
    * document scored by mean bigram log-probability against it
    * (`perplexityScores`), flagged where perplexity says it is far from
    * the trusted distribution. Train = two vocabulary-bounded
    * aggregations; score = equality joins AQE broadcasts while the model
    * is small; the scoring join is stream-static, so the gate runs
    * unchanged over a stream.
    */
  def q108LmPerplexity(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val lm = TextAnalysis.trainBigramLm(docs.filter(col("lang") === "en"))
    TextAnalysis.perplexityScores(docs, lm)
      .select(col("doc_id"), col("n_bigrams"),
        round(col("avg_lp"), 6).as("avg_lp"),
        round(col("ppl"), 4).as("ppl"))
      .withColumn("flagged", col("ppl") > lit(32.0))
  }

  /** Supervised model-based labeling: a multinomial Naive-Bayes
    * classifier trained closed-form on the 80% split's (text, lang)
    * pairs (`TextAnalysis.trainNaiveBayes` — training is literally two
    * count aggregations) and evaluated on the held-out 20%, per-document
    * prediction vs truth. The supervised sibling of q108's perplexity
    * gate: real curation pipelines bootstrap quality/domain labels from
    * a seed set exactly this way.
    */
  def q109NbLangid(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val model = TextAnalysis.trainNaiveBayes(
      docs.filter(col("doc_id") % 10 < 8), "lang")
    TextAnalysis.naiveBayesClassify(
      docs.filter(col("doc_id") % 10 >= 8), model)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .withColumn("correct", col("pred") === col("lang"))
  }

  /** Incremental LM-perplexity admission — the deployment shape of the
    * q108 gate (and exactly CCNet's): the model is trained ONCE on the
    * trusted history corpus (doc_id % 5 != 0 here), and each arriving
    * batch (doc_id % 5 == 0) is scored and admitted against it.
    * Per-batch work scales with the batch (one tokenize + model join),
    * never the history; the history cost is the one-time train, exactly
    * like q98's segment-df snapshot and q107's posting history.
    */
  def q111LmAdmission(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val lm = TextAnalysis.trainBigramLm(docs.filter(col("doc_id") % 5 =!= 0))
    TextAnalysis.perplexityScores(docs.filter(col("doc_id") % 5 === 0), lm)
      .filter(round(col("ppl"), 4) <= lit(33.0))
      .select(col("doc_id"))
  }

  /** Snapshot diff + distribution drift between two corpus versions
    * (v1 = doc_id % 7 != 0, v2 = doc_id % 5 != 0 — overlapping slices so
    * churn flows both ways): per source, content-fingerprint
    * added/removed/kept counts (`Drift.snapshotDiff` — re-keyed
    * republications don't count as churn) joined with the add-k-smoothed
    * token-distribution KL divergence D(v2 ‖ v1)
    * (`Drift.tokenKlDrift`) — the "did the crawl shift under us" alarm
    * that gates whether a refreshed snapshot is safe to train on.
    */
  def q113SnapshotDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val v1 = docs.filter(col("doc_id") % 7 =!= 0)
    val v2 = docs.filter(col("doc_id") % 5 =!= 0)
    Drift.snapshotDiff(v1, v2)
      .join(Drift.tokenKlDrift(v1, v2), Seq("source"))
      .select(col("source"), col("n_added"), col("n_removed"),
        col("n_kept"), round(col("kl"), 6).as("kl"))
  }

  /** Hard-negative mining over the embedding corpus: per-label anchor
    * exemplars, then each anchor's 10 most-similar WRONG-label vectors
    * (`Similarity.hardNegatives`) — the contrastive-training data op
    * (random negatives are trivially separable; high-similarity
    * wrong-label ones are the training signal). Exercises the two-phase
    * `operators.TopK` ranking: exact per-anchor top-k with no
    * single-task window.
    */
  def q110HardNegatives(spark: SparkSession, dir: String): DataFrame =
    Similarity.hardNegatives(Tables.load(spark, dir, "embeddings"), k = 10)

  /** Exact-substring span removal (`Dedup.removeSharedSubstrings`) —
    * the rewrite the Lee et al. 2021 pipeline actually applies: every
    * document survives, but any sampled 100-char window shared with
    * another document is cut except in its minimum-id keeper (shared by
    * 2..50 docs — past the df cap it's boilerplate, q96's job), with
    * overlapping spans merged before the fold-based rebuild. The oracle
    * replays the decision per character (a covered-position set), which
    * equals the interval-fold rewrite by construction.
    */
  def q115SubstringScrub(spark: SparkSession, dir: String): DataFrame =
    Dedup.removeSharedSubstrings(Tables.load(spark, dir, "documents"))

  /** Incremental span removal (`Dedup.removeSharedSubstringsIncremental`):
    * the 20% refresh slice scrubbed against the 80% history's
    * materialized fingerprint snapshot — q107's corpus-refresh contract
    * for the REWRITE form. Work is batch-sized (the positioned-gram
    * kernel never touches history text; history contributes only its
    * (gh, df, keeper) aggregate, computed in-plan here for gate
    * self-containment, a write-once bucketed table in production). The
    * oracle replays the equivalent whole-corpus keeper computation
    * restricted to batch documents.
    */
  def q116IncrementalScrub(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    Dedup.removeSharedSubstringsIncremental(
      docs.filter(col("doc_id") % 5 === 0),
      Dedup.substringFingerprintSnapshot(docs.filter(col("doc_id") % 5 =!= 0)))
  }

  /** Winnowed exact-substring duplicate pairs
    * (`Dedup.winnowedDupPairs`, Schleimer et al. 2003): k = 40, w = 10,
    * so any verbatim shared run of ≥ 49 code points is DETECTED BY
    * CONSTRUCTION — the guarantee the mod-p sampled q103 family trades
    * away. The oracle replays the rightmost-min-per-window selection
    * relationally (window-min + rightmost-argmin join) and then the
    * family's standard df-capped pair join.
    */
  def q117WinnowPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.winnowedDupPairs(Tables.load(spark, dir, "documents"))

  /** Expected-k weighted Bernoulli sample
    * (`Sampling.weightedBernoulliSample`): per language, documents kept
    * with probability proportional to length (k = 50 expected per
    * stratum) — the PPS curation gate. The keep decision is
    * hash < k·w/ΣW with exact-long weights and one IEEE divide, so the
    * oracle replays it bit-for-bit; with a frozen ΣW table the same
    * gate is stateless over a stream.
    */
  def q118WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    Sampling.weightedBernoulliSample(docs, col("lang"), col("n_chars"),
      k = 50, Sampling.weightedTotals(docs, col("lang"), col("n_chars")))
      .select(col("doc_id"), col("lang"), col("n_chars"))
  }

  /** Length-bucketed batch manifest (`Packing.lengthBucketedBatches`):
    * documents sorted by (n_chars, doc_id), cut into 64-doc batches,
    * per-batch padding-waste audit — the sequence-bucketing gain every
    * padded-batch loader banks. Global rank rides the two-phase prefix
    * sum; the oracle replays the same rank arithmetic.
    */
  def q120LengthBatches(spark: SparkSession, dir: String): DataFrame =
    Packing.lengthBucketedBatches(
      Tables.load(spark, dir, "documents"), batchSize = 64,
      lenCol = "n_chars")

  /** Hilbert-curve layout key (`Layout.hilbertKey2`) over the same
    * (part, supplier) pair as the Morton q101 — the locality-tighter
    * space-filling curve (consecutive keys are always adjacent cells;
    * Morton jumps at power-of-2 boundaries). Pure integer rotate-and-
    * reflect in a codegen'd native expression; the oracle unrolls the
    * identical per-bit walk as 16 chained CTE stages.
    */
  def q119HilbertKey(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.sources.Layout.hilbertKey2(
          col("l_partkey"), col("l_suppkey")).as("hkey"))

  /** DuckDB replay of [[q119HilbertKey]]'s per-bit rotate-and-reflect
    * walk, unrolled to one CTE stage per bit (a LINEAR chain — each
    * stage is referenced exactly once, so no materialization is needed,
    * unlike the doubly-referenced BPE rounds). Integer arithmetic only.
    */
  private def hilbertOracle(bits: Int): String = {
    val n = 1L << bits
    val head = s"""h0 AS (
  SELECT l_orderkey, l_linenumber,
    l_partkey % $n AS x, l_suppkey % $n AS y, CAST(0 AS BIGINT) AS d
  FROM lineitem)"""
    val stages = (0 until bits).map { i =>
      val s = 1L << (bits - 1 - i)
      s"""h${i + 1} AS (
  SELECT l_orderkey, l_linenumber,
    CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN ${n - 1} - y ELSE y END ELSE x END AS x,
    CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN ${n - 1} - x ELSE x END ELSE y END AS y,
    d + ${s * s} * xor(3 * rx, ry) AS d
  FROM (SELECT *, (x // $s) % 2 AS rx, (y // $s) % 2 AS ry FROM h$i))"""
    }
    (head +: stages).mkString("WITH ", ",\n", "") +
      s"\nSELECT l_orderkey, l_linenumber, d AS hkey FROM h$bits"
  }

  /** BPE tokenizer-training pair statistics (round 1 of `Bpe.train`):
    * top-30 frequency-weighted adjacent character pairs over the
    * word-frequency table — one corpus shuffle, then vocabulary-sized
    * work, the scale shape of the whole trainer. Deterministic cut:
    * count desc, then (sym1, sym2).
    */
  def q104BpePairs(spark: SparkSession, dir: String): DataFrame =
    Bpe.bpePairCounts(Tables.load(spark, dir, "documents"))

  /** Prototypicality pruning over the embedding corpus (Sorscher et al.
    * 2022, `Similarity.prototypicalityPrune`): 8 deterministic seed
    * centroids, every vector scored by cosine to its centroid, the
    * most-prototypical 60% of each cluster dropped — the
    * data-abundant-regime pruning rule (keep the hard examples). The
    * per-cluster cut is `Sampling.topFractionByStratum`'s exact
    * integer-rank cut, so its frozen-threshold streaming admission
    * applies unchanged.
    */
  def q114ClusterPrune(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val cents = Similarity.sampleCentroids(emb, 8)
    Similarity.prototypicalityPrune(emb, cents, keepFrac = 0.4)
      .select(col("bucket"), col("vec_id"),
        round(col("proto"), 6).as("proto"))
  }

  /** BPE corpus encoding under a model trained on the 80% split
    * (`Bpe.train` → `Bpe.encodeCorpus`): per-document BPE token / word /
    * OOV-word counts over the full corpus. The apply-side of the
    * tokenizer story — trained segmentations ride a broadcast vocab
    * join; only OOV words (possible only in the held-out 20%) replay
    * the merge fold. Oracle: the full train+encode pipeline replayed in
    * DuckDB via [[bpeEncodeOracle]] (greedy merge = boundary-wrapped
    * `replace()`, training rounds unrolled to materialized CTEs).
    */
  def q112BpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val (merges, vocab) = Bpe.train(
      docs.filter(col("doc_id") % 10 < 8), nMerges = 12)
    Bpe.encodeCorpus(docs, merges, vocab)
  }

  /** Product-quantization ANN (Jégou et al. 2011): 4 subspaces × 8
    * deterministic seed sub-centroids, vectors encoded to 4 codes,
    * ranking by the asymmetric per-query distance lookup table
    * (`Similarity.pqTopK`). The third compression point on the ANN
    * surface: rproj shrinks dims, SQ8 shrinks floats to ints, PQ
    * shrinks vectors to m codebook ids.
    */
  def q105PqTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val books = Similarity.pqCodebooks(emb, m = 4, k = 8)
    Similarity.pqTopK(emb, books, Similarity.probeVector(emb), k = 10)
  }

  /** PQ over a materialized code table (the build-once index: m ints per
    * vector, ~64× less scan IO than the floats) — same algebra and
    * oracle as q105, physical layout differs.
    */
  def q106PqIndexed(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val books = Similarity.pqCodebooks(emb, m = 4, k = 8)
    val idx = scratchPath(spark, "pq", dir)
    Similarity.writePqIndex(emb, books, idx)
    Similarity.pqTopKIndexed(spark, idx, books, Similarity.probeVector(emb), k = 10)
  }

  /** Two-stage PQ + exact rerank (the production ANN query shape): ADC
    * shortlist of 100 from the 4×8 code space, exact cosine over just
    * those 100 floats, final top-10 ([[graft.ext.Similarity
    * .pqRerankTopK]]). Oracle: the q105 ADC chain cut at 100 feeding the
    * q25 exact-cosine ranking.
    */
  def q127PqRerank(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val books = Similarity.pqCodebooks(emb, m = 4, k = 8)
    Similarity.pqRerankTopK(emb, books, Similarity.probeVector(emb),
      k = 10, shortlist = 100)
  }

  /** BM25 lexical retrieval ([[graft.ext.Retrieval.bm25TopK]]): top-10
    * docs for a three-term query — the sparse-retrieval counterpart of
    * the embedding ANN family (q25/q33/q72/q105), used to pull topical
    * slices without an embedding model in the loop.
    */
  def q128Bm25TopK(spark: SparkSession, dir: String): DataFrame =
    Retrieval.bm25TopK(Tables.load(spark, dir, "documents"),
      Seq("spark", "stream", "window"), k = 10)

  /** Importance-weight health audit for the q122 DSIR weights
    * ([[graft.ext.Dsir.essAudit]]): effective sample size, its fraction
    * of n, and the max single-weight share — the "did the weights
    * collapse onto a handful of documents" check run before trusting
    * any importance-resampled corpus.
    */
  def q129DsirEss(spark: SparkSession, dir: String): DataFrame =
    Dsir.essAudit(Tables.load(spark, dir, "documents"),
      col("lang") === "en", buckets = 1024)

  /** Exact-k deterministic per-language holdout
    * ([[graft.ext.Sampling.exactKPerStratum]]): 10 docs per language
    * ranked by the md5 uniform — the stable eval-set constructor
    * (rate-based q65 re-draws under growth; this displaces at most one
    * row per new arrival).
    */
  def q130StratifiedHoldout(spark: SparkSession, dir: String): DataFrame =
    Sampling.exactKPerStratum(
      Tables.load(spark, dir, "documents").select(col("doc_id"), col("lang")),
      col("lang"), k = 10)

  /** Dedup-threshold sensitivity curve
    * ([[graft.ext.Dedup.dedupThresholdCurve]]): verified pair count and
    * keep-first docs-dropped at each candidate Jaccard threshold, from
    * ONE pair-pipeline pass at the loosest point.
    */
  def q131ThresholdCurve(spark: SparkSession, dir: String): DataFrame =
    Dedup.dedupThresholdCurve(Tables.load(spark, dir, "documents"))

  /** Batched-probe IVF search ([[graft.ext.Similarity.ivfTopKBatch]])
    * under the PRODUCTION sizing path: nlist =
    * [[graft.ext.Similarity.indexParams]](N).nlist = ⌈√N⌉ derived from
    * the corpus count (past the 16-centroid threshold, so assignment and
    * probing ride the flat-matrix `NearestCentroidsF` kernel). Every
    * 500th vector is a probe; all probes ride ONE plan — probe table
    * broadcast into the bucket join, per-query top-10 via the two-phase
    * bounded ranking. The production retrieval shape (q33 is the
    * single-probe form). A FIXED nlist here would make probe work
    * Q·N·nprobe/nlist — quadratic when probes and corpus grow together,
    * measured 41× slower than this form at 100× (rounds 9–10) — so the
    * graded query registers the derived sizing and the fixed-quantizer
    * configuration survives only in SimilaritySpec; the oracle
    * re-derives ⌈√N⌉ from its own count(*).
    */
  def q132IvfBatch(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val nlist = Similarity.indexParams(emb.count()).nlist
    val centroids = Similarity.sampleCentroids(emb, m = nlist)
    val queries = emb.filter(col("vec_id") % 500 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    Similarity.ivfTopKBatch(Similarity.assignBuckets(emb, centroids),
      centroids, queries, k = 10, nprobe = 3)
  }

  /** Incremental embedding near-dup admission
    * ([[graft.ext.Similarity.incrementalCosineDedupBatch]]): vectors
    * with vec_id % 5 == 0 stand in for the refresh batch (mirroring
    * q90's split); a batch vector is admitted unless it cosine-matches
    * (≥ 0.35) a history vector or an earlier batch vector through the
    * hyperplane-LSH bands. Completes the incremental-admission family
    * across modalities (q90 shingles, q107 char-grams, this:
    * embeddings). Band width is the PRODUCTION `bands = 0`
    * auto-derivation (4×16-bit at ≤2¹⁶ vectors, per
    * [[graft.ext.Similarity.indexParams]]), the corpus size counted once
    * and threaded through `n` — a fixed narrow key makes band-collision
    * rate grow with N and the bucket joins quadratic (the 8-bit test
    * width measured 19× slower than this form at 100×, rounds 9–10), so
    * the graded query registers the derived width and the fixed-width
    * configuration survives only in SimilaritySpec; the oracle
    * re-derives the width from its own count(*).
    */
  def q133IncrCosineDedup(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val n = emb.count()
    Similarity.incrementalCosineDedupBatch(
      emb.filter(col("vec_id") % 5 =!= 0),
      emb.filter(col("vec_id") % 5 === 0),
      threshold = 0.35, planes = 64, bands = 0, n = n)
      .select(col("vec_id"), col("label"))
  }

  /** Snapshot-based incremental embedding admission
    * ([[graft.ext.Similarity.incrementalCosineDedupAgainstSnapshot]]):
    * the q133 workload with history touched only through a materialized
    * [[graft.ext.Similarity.cosineBandSnapshot]] — the production
    * refresh shape where per-refresh work is batch-sized. Decisions are
    * identical to the direct window form by construction (spec-pinned),
    * so it replays against the SAME whole-corpus oracle as q133. Like
    * q133, the snapshot is built with the PRODUCTION `bands = 0` width
    * (the scrubber re-derives it from the snapshot's band column) — the
    * width population is the WHOLE corpus (one `emb.count()`, threaded
    * via `n`), the same population the oracle's `count(*)` ladder uses:
    * deriving from the history count alone would diverge from the
    * oracle exactly at a 2¹⁶/2³² population boundary with no code bug,
    * and the combined population is what the bucket-cap collision math
    * must track anyway. The fixed 8-bit test width (17× slower at 100×)
    * survives only in SimilaritySpec.
    */
  def q135IncrCosineSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val hist = emb.filter(col("vec_id") % 5 =!= 0)
    val snap = Similarity.cosineBandSnapshot(hist, planes = 64, bands = 0,
      n = emb.count())
    Similarity.incrementalCosineDedupAgainstSnapshot(
      hist, snap, emb.filter(col("vec_id") % 5 === 0),
      threshold = 0.35, planes = 64)
      .select(col("vec_id"), col("label"))
  }

  /** Batched-IVF recall@10 audit
    * ([[graft.ext.Similarity.ivfBatchRecallAudit]]): per probe query,
    * the fraction of the exact cosine top-10 the q132 IVF search
    * recovers at nprobe=3 — audited at the SAME derived-⌈√N⌉ operating
    * point q132 runs (auditing a quantizer nothing deploys answers
    * nothing). The acceptance check before trusting an (nlist, nprobe)
    * operating point, completing the ANN audit family (q78 is the rproj
    * sibling). BUDGETED since round 12: the audited set is the 128
    * smallest-uniform-hash members of the q132 probe pool, pinning the
    * brute ground-truth side at 128·N — the formerly-exact whole-pool
    * form made Q grow with the corpus (Q·N = the last N²-family plan in
    * the registry, 75.6 s at 100× in round 11) for no extra information
    * about the recall DISTRIBUTION, and it survives in SimilaritySpec,
    * not here. q152 is the same budgeted audit over the denser %10 pool
    * at budget 256.
    */
  def q137IvfRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val nlist = Similarity.indexParams(emb.count()).nlist
    val centroids = Similarity.sampleCentroids(emb, m = nlist)
    val queries = emb.filter(col("vec_id") % 500 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    Similarity.ivfBatchRecallAudit(Similarity.assignBuckets(emb, centroids),
      centroids, queries, k = 10, nprobe = 3, maxProbes = 128)
  }

  /** NB margin-reliability audit
    * ([[graft.ext.TextAnalysis.naiveBayesMarginAudit]]): the q109
    * classifier's held-out docs bucketed by best-vs-second log-margin,
    * per-bucket volume and accuracy — the calibration table consulted
    * before margin-thresholded auto-labeling. Margins are differences
    * of the 6dp-rounded scores, so the oracle replays the binning
    * bit-exactly (no softmax/exp in the decision path).
    */
  def q136NbCalibration(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val model = TextAnalysis.trainNaiveBayes(
      docs.filter(col("doc_id") % 10 < 8), "lang")
    TextAnalysis.naiveBayesMarginAudit(
      docs.filter(col("doc_id") % 10 >= 8), model, "lang")
  }

  /** REAL image decode ([[graft.ext.MultiModal.decodeImageFeatures]] —
    * the multimodal family's formerly-stubbed decode made real via the
    * JDK's `javax.imageio`, zero new dependencies): every doc id becomes
    * a deterministic solid-color PNG ([[graft.ext.MultiModal
    * .syntheticPngMedia]]), and the decode pass recovers dimensions,
    * band count, and exact per-channel means by actual pixel work. PNG
    * is lossless, so the oracle predicts the decoded stats in closed
    * form from the id — a genuine encode→decode round-trip check.
    */
  def q134ImageDecode(spark: SparkSession, dir: String): DataFrame =
    MultiModal.decodeImageFeatures(
      MultiModal.syntheticPngMedia(Tables.load(spark, dir, "documents")))

  /** REAL audio decode ([[graft.ext.MultiModal.decodeAudioFeatures]] —
    * the q134 playbook applied to the audio half of the multimodal
    * surface via the JDK's `javax.sound.sampled`, zero new
    * dependencies): every doc id becomes a deterministic 16-bit PCM WAV
    * clip ([[graft.ext.MultiModal.syntheticWavMedia]]), and the decode
    * pass recovers channel count, sample rate, frame count, and exact
    * per-channel RMS by actual sample work (streamed through one reused
    * frame-aligned buffer). PCM is lossless, so the oracle predicts the
    * decoded stats in closed form from the id — a genuine
    * encode→decode round-trip check.
    */
  def q141AudioDecode(spark: SparkSession, dir: String): DataFrame =
    MultiModal.decodeAudioFeatures(
      MultiModal.syntheticWavMedia(Tables.load(spark, dir, "documents")))

  /** REAL multi-frame (video-shaped) decode with frame sampling
    * ([[graft.ext.MultiModal.decodeVideoFrames]] — the last multimodal
    * stub made real on the one multi-frame container the JDK ships a
    * codec for, animated GIF): every doc id becomes a deterministic
    * short clip ([[graft.ext.MultiModal.syntheticGifMedia]], 2–5
    * solid-color frames with id-and-frame-derived palettes), and the
    * decode pass samples every 2nd frame — the keyframe access pattern —
    * recovering each sampled frame's dimensions and exact per-channel
    * means by actual raster work. Indexed-palette GIF is lossless, so
    * the oracle predicts every sampled frame's stats in closed form
    * from (id, frame).
    */
  def q142VideoFrames(spark: SparkSession, dir: String): DataFrame =
    MultiModal.decodeVideoFrames(
      MultiModal.syntheticGifMedia(Tables.load(spark, dir, "documents")),
      stride = 2)

  /** REAL image resize ([[graft.ext.MultiModal.resizeImageFeatures]] —
    * the resize kernel made real: decode → nearest-neighbor raster
    * downscale to ⌈dims/2⌉ → PNG re-encode, per record,
    * partition-batched), audited by decoding the RESIZED payload: a
    * solid-color source stays solid under any resampling, so the oracle
    * predicts the resized dimensions and exact per-channel means in
    * closed form from the id. (The re-encoded byte size is
    * encoder-dependent and deliberately not part of the graded output.)
    */
  /** Portable HyperLogLog distinct counting
    * ([[graft.ext.Sketches.hllDistinct]]): per event type, the md5-HLL
    * estimate of distinct users AND distinct events beside the exact
    * counts — the 100 TB distinct-count shape (two map-side-combining
    * aggregations shuffling at most groups×256 register rows, vs exact
    * distinct shuffling every value). The two value columns land on
    * BOTH HLL branches at sf0.01 (users ≈ 150/type → linear-counting
    * correction; events ≈ 2000/type → raw harmonic estimate), and the
    * register fold is integer-exact (Σ 2^(53−ρmax)), so the DuckDB
    * oracle replays the whole sketch — including the estimates — to the
    * 6dp hash, not "within tolerance".
    */
  def q144HllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    val exact = ev.groupBy(col("event_type")).agg(
      countDistinct(col("user_id")).as("exact_users"),
      countDistinct(col("event_id")).as("exact_events"))
    val users = Sketches.hllDistinct(ev, Seq("event_type"), "user_id")
      .select(col("event_type"), col("hll_est").as("est_users"))
    val events = Sketches.hllDistinct(ev, Seq("event_type"), "event_id")
      .select(col("event_type"), col("hll_est").as("est_events"))
    exact.join(users, Seq("event_type")).join(events, Seq("event_type"))
      .select(col("event_type"), col("exact_users"), col("est_users"),
        col("exact_events"), col("est_events"))
  }

  /** Portable count-min heavy-hitter audit
    * ([[graft.ext.Sketches.countMinSketch]] /
    * [[graft.ext.Sketches.cmsEstimate]]): a 4×512 CMS over per-user
    * event counts, probed for the exact top-20 users — (user_id,
    * exact_cnt, cms_cnt), with cms_cnt ≥ exact_cnt guaranteed by the
    * sketch's one-sided error. Counts are integers and hashes
    * md5-portable, so the DuckDB oracle replays the whole sketch
    * hash-exactly. The sketch is a fixed d·w-cell summary — the
    * frequency shape for 100 TB where exact counting shuffles every
    * distinct key.
    */
  def q145CmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    val sketch = Sketches.countMinSketch(ev, "user_id")
    val exact = ev.where(col("user_id").isNotNull)
      .groupBy(col("user_id")).agg(count(lit(1)).as("exact_cnt"))
    val top = exact.orderBy(col("exact_cnt").desc, col("user_id").asc).limit(20)
    Sketches.cmsEstimate(sketch, top, "user_id")
      .join(top, Seq("user_id"))
      .select(col("user_id"), col("exact_cnt"), col("cms_cnt"))
  }

  /** Portable log2-histogram quantile audit
    * ([[graft.ext.Sketches.logHistogram]] /
    * [[graft.ext.Sketches.histQuantiles]]): per-language token-count
    * percentiles from a subBits=6 exponent/mantissa histogram —
    * (lang, n_docs, exact_p50, est_p50, exact_p90, est_p90, exact_p99,
    * est_p99), est within 2^−7 ≈ 0.8% relative error of exact by
    * construction. Both sides use the same integer nearest-rank
    * arithmetic (⌈n·q⌉ via (n·num+den−1) div den) and the "exact"
    * columns reuse [[graft.ext.Sketches.histQuantiles]] over the exact
    * value histogram (s = 0, top = v), so the whole query is integer
    * arithmetic end-to-end — the DuckDB oracle replays it bit-exactly.
    * The sketch is the scale path: ≤ ~3.8k additive cells per language
    * regardless of corpus size, where exact percentiles shuffle every
    * distinct length.
    */
  def q146HistQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val specs = Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))
    val toks = Tables.load(spark, dir, "documents").select(col("lang"),
      size(filter(split(col("text"), " "), w => w =!= ""))
        .cast("long").as("v"))
    val est = Sketches.histQuantiles(
      Sketches.logHistogram(toks, Seq("lang"), "v"), Seq("lang"), specs)
    val exactHist = toks.groupBy(col("lang"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("lang"), lit(0).as("s"), col("v").as("top"), col("cnt"))
    val exact = Sketches.histQuantiles(exactHist, Seq("lang"), specs)
      .withColumnRenamed("est", "exact")
    val nDocs = toks.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val both = est.join(exact, Seq("lang", "qname"))
    val aggs = specs.flatMap { case (nm, _, _) => Seq(
      max(when(col("qname") === nm, col("exact"))).as(s"exact_$nm"),
      max(when(col("qname") === nm, col("est"))).as(s"est_$nm")) }
    nDocs.join(
      both.groupBy(col("lang")).agg(aggs.head, aggs.tail: _*),
      Seq("lang"))
      .select(col("lang") +: col("n_docs") +:
        specs.flatMap { case (nm, _, _) =>
          Seq(col(s"exact_$nm"), col(s"est_$nm")) }: _*)
  }

  /** HLL set-algebra overlap audit ([[graft.ext.Sketches.hllRegisters]]
    * / [[graft.ext.Sketches.hllEstimate]]): estimated distinct-vocab
    * overlap between every pair of document sources by
    * inclusion–exclusion — est_intersect = est_a + est_b − est_union,
    * where the union estimate comes from MAX-MERGING the two sources'
    * register tables (lossless: the merged registers ARE the sketch of
    * the concatenated corpora). Exact columns are computed alongside
    * for the audit. (source_a, source_b, exact_a, exact_b,
    * exact_intersect, est_a, est_b, est_union, est_intersect).
    *
    * 100 TB posture: the sketch path never materializes the vocab —
    * registers are a ≤ sources×256-row table built by one map-side-
    * combining agg, and every pair union is algebra over that tiny
    * table; the exact columns (distinct + a term-keyed self-join) are
    * the audit-only part you drop at scale. Pairs are enumerated from
    * the term join (shared-vocab pairs), so no cross join appears.
    */
  def q147HllOverlap(spark: SparkSession, dir: String): DataFrame = {
    val st = Tables.load(spark, dir, "documents")
      .select(col("source"),
        explode(filter(split(lower(col("text")), " "), w => w =!= ""))
          .as("term"))
      .distinct()
    val regs = Sketches.hllRegisters(st, Seq("source"), "term")
    val sest = Sketches.hllEstimate(regs, Seq("source"))
      .select(col("source"), col("hll_est").as("est"))
    val px = st.as("x").join(st.as("y"),
        col("x.term") === col("y.term") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(count(lit(1)).as("exact_intersect"))
    val pregs = px.select(col("source_a"), col("source_b"))
      .withColumn("source", explode(array(col("source_a"), col("source_b"))))
      .join(regs, Seq("source"))
      .groupBy(col("source_a"), col("source_b"), col("bucket"))
      .agg(max(col("M")).as("M"))
    val pest = Sketches.hllEstimate(pregs, Seq("source_a", "source_b"))
      .select(col("source_a"), col("source_b"),
        col("hll_est").as("est_union"))
    val exv = st.groupBy(col("source")).agg(count(lit(1)).as("exact_vocab"))
    px.join(exv.select(col("source").as("source_a"),
        col("exact_vocab").as("exact_a")), Seq("source_a"))
      .join(exv.select(col("source").as("source_b"),
        col("exact_vocab").as("exact_b")), Seq("source_b"))
      .join(sest.select(col("source").as("source_a"),
        col("est").as("est_a")), Seq("source_a"))
      .join(sest.select(col("source").as("source_b"),
        col("est").as("est_b")), Seq("source_b"))
      .join(pest, Seq("source_a", "source_b"))
      .select(col("source_a"), col("source_b"), col("exact_a"),
        col("exact_b"), col("exact_intersect"), col("est_a"), col("est_b"),
        col("est_union"),
        round(col("est_a") + col("est_b") - col("est_union"), 6)
          .as("est_intersect"))
  }

  def q143ImageResize(spark: SparkSession, dir: String): DataFrame =
    MultiModal.resizeImageFeatures(
      MultiModal.syntheticPngMedia(Tables.load(spark, dir, "documents")),
      factor = 2)
      .select(col("media_id"), col("width"), col("height"), col("bands"),
        col("mean_r"), col("mean_g"), col("mean_b"))

  /** Hybrid sparse+dense retrieval via reciprocal-rank fusion
    * ([[graft.ext.Retrieval.rrfHybridTopK]]): the graded BM25 top-10
    * (q128's lexical list) fused with the graded exact-cosine top-10
    * (q25's dense list) at the standard rrfK = 60 — the calibration-free
    * way production curation combines the two retrieval modalities.
    */
  def q148RrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    Retrieval.rrfHybridTopK(
      Tables.load(spark, dir, "documents"), emb,
      Seq("spark", "stream", "window"), Similarity.probeVector(emb), k = 10)
  }

  /** PageRank centrality over the verified near-dup pair graph
    * ([[graft.ext.Graph.pageRankUndirected]]): 3 power-iteration rounds,
    * damping 0.85, over the same jaccard ≥ 0.5 edges the CC family
    * (q60/q74/q121) consumes — the link-analysis canonicalization signal
    * (which member anchors its duplicate family). Oracle: the shared
    * minhash pair chain + the three rounds unrolled as CTEs.
    */
  def q149PagerankCentrality(spark: SparkSession, dir: String): DataFrame =
    Graph.pageRankUndirected(
      Dedup.verifiedNearDups(Tables.load(spark, dir, "documents"),
        threshold = 0.5),
      iters = 3)
      .select(col("node").as("doc_id"),
        round(col("pagerank"), 6).as("pagerank"))

  /** Triangle census of the verified near-dup graph
    * ([[graft.ext.Graph.triangleCensus]]): node/edge/wedge/triangle
    * counts and global transitivity over the jaccard ≥ 0.5 pair graph —
    * the cluster-shape audit that separates clique-like true duplicate
    * families (transitivity → 1) from chain-like transitive over-merges
    * (→ 0). All-integer until the final ratio, so the oracle replays it
    * exactly.
    */
  def q150TriangleCensus(spark: SparkSession, dir: String): DataFrame =
    Graph.triangleCensus(
      Dedup.verifiedNearDups(Tables.load(spark, dir, "documents"),
        threshold = 0.5))

  /** Triangle support for freshly-admitted near-dup pairs
    * ([[graft.ext.Graph.edgeSupport]]): pairs touching a refresh-batch
    * doc (doc_id % 5 == 0, the q90/q133 split convention) scored by
    * common-neighbor count in the FULL dup graph — corroborated
    * duplicates sit in triangles; support-0 pairs are isolated claims
    * to re-verify. The graph-side completion of the incremental
    * admission family.
    */
  def q151EdgeSupport(spark: SparkSession, dir: String): DataFrame =
    Graph.edgeSupport(
      Dedup.verifiedNearDups(Tables.load(spark, dir, "documents"),
        threshold = 0.5),
      col("id1") % 5 === 0 || col("id2") % 5 === 0)

  /** Budgeted-probe recall audit
    * ([[graft.ext.Similarity.ivfBatchRecallAudit]] with `maxProbes`) —
    * the PRODUCTION form of q137: the brute ground truth is irreducibly
    * Q·N per audited query, and any RATE keeps Q ∝ the query stream —
    * quadratic whenever probes grow with the corpus (q137's documented
    * physics). A FIXED audit budget is the scale-safe form: the 256
    * pool queries with the smallest md5 uniform (deterministic, exact-k
    * — replayed by the oracle as an ORDER-BY-hash row_number cut) pin
    * the brute side at 256·N, linear at any corpus size. Pool is every
    * 10th vector — 50× denser than q137's, irrelevant to cost because
    * the budget, not the pool, sizes the audit. Same derived-⌈√N⌉
    * operating point as q132/q137.
    */
  def q152IvfRecallSampled(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val nlist = Similarity.indexParams(emb.count()).nlist
    val centroids = Similarity.sampleCentroids(emb, m = nlist)
    val queries = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    Similarity.ivfBatchRecallAudit(Similarity.assignBuckets(emb, centroids),
      centroids, queries, k = 10, nprobe = 3,
      sampleSalt = "recall", maxProbes = 256)
  }

  /** REAL lossy JPEG re-encode
    * ([[graft.ext.MultiModal.jpegReencodeFeatures]]): every doc id's
    * deterministic PNG master is decoded, re-encoded through the JDK's
    * JPEG writer at quality 0.75, and the JPEG is decoded again — the
    * storage-tiering transform, closing the last byte-level stand-in in
    * the multimodal surface. Lossy output splits into two audit
    * classes: the codec-contract-EXACT parts (dims, band count) are
    * graded closed-form from the id, and the lossy part is graded as
    * `within_tol` (max per-channel mean error ≤ 8) — sound because
    * MultiModalSpec proves the JDK codec's solid-color round-trip error
    * ≤ 3 exhaustively over the fixture's full (dims × color) period.
    * Byte-size report columns are dropped here: deterministic but not
    * external-engine-replayable (no DuckDB JPEG codec).
    */
  def q153JpegReencode(spark: SparkSession, dir: String): DataFrame =
    MultiModal.jpegReencodeFeatures(
      MultiModal.syntheticPngMedia(Tables.load(spark, dir, "documents")))
      .select(col("media_id"), col("width"), col("height"), col("bands"),
        col("within_tol"))

  /** Margin-based parallel-pair mining
    * ([[graft.ext.Similarity.marginMinedPairs]] — Artetxe & Schwenk
    * 2019): label-0 vectors as the source slice, label-1 as the target,
    * a pair mined when its cosine stands out of BOTH vectors'
    * k=4 neighborhoods (margin ≥ 1.02) — the standard constructor of
    * mined translation/paraphrase pairs for multilingual training data,
    * where raw cosine cannot separate true pairs from hub vectors.
    * Candidates form across sides within derived-⌈√N⌉ coarse clusters
    * (the SemDeDup shape — bounded by the largest cluster, never the
    * corpus); margins are integer-exact (6dp-fixed cosines, integer
    * neighborhood sums, one double division), so the oracle replays
    * every mined pair hash-exactly.
    */
  def q154MarginMining(spark: SparkSession, dir: String): DataFrame =
    Similarity.marginMinedPairs(Tables.load(spark, dir, "embeddings"),
      srcLabel = 0, tgtLabel = 1)

  /** kNN label propagation
    * ([[graft.ext.Similarity.knnLabelPropagation]]): vectors with
    * vec_id % 3 == 0 act as the labeled seed set; every other vector is
    * auto-labeled by the majority of its 5 nearest same-cluster seeds —
    * the semi-supervised bootstrap a curation pipeline runs when
    * quality/domain labels cover only a sliver of the corpus. Candidates
    * are cluster-bounded (derived ⌈√N⌉, the SemDeDup shape), the
    * decision path is all-integer (6dp-fixed cosines, vote counts,
    * best-cosine tie-break), and targets with no same-cluster seed emit
    * no row (auditable by anti-join) rather than taking a distant label.
    */
  def q155KnnLabels(spark: SparkSession, dir: String): DataFrame =
    Similarity.knnLabelPropagation(Tables.load(spark, dir, "embeddings"),
      isSeed = col("vec_id") % 3 === 0)

  /** Budgeted mining-recall audit
    * ([[graft.ext.Similarity.knnPropagationRecallAudit]]): for the 256
    * audited targets with the smallest md5-uniform hash, the fraction of
    * the exact cosine top-5 seeds that q155's cluster-bounded candidate
    * generation recovers — the measurement round 11 flagged as missing
    * for the mining family (q154/q155 bounded their cost but nothing
    * priced what single-probe bounding misses). The q152 shape: the
    * exact side is budget·|seeds| via one broadcast, linear in the
    * corpus at any target volume. Targets whose true neighbors straddle
    * a cluster boundary (or live in a capped cluster) score below 1.0
    * here instead of being silently mislabeled there; q157 runs the
    * multi-probe mitigation this audit prices.
    */
  def q156KnnRecall(spark: SparkSession, dir: String): DataFrame =
    Similarity.knnPropagationRecallAudit(
      Tables.load(spark, dir, "embeddings"),
      isSeed = col("vec_id") % 3 === 0, maxProbes = 256)

  /** Multi-probe kNN label propagation
    * ([[graft.ext.Similarity.knnLabelPropagation]]): the q155 workload
    * with each TARGET probing its `nprobe` nearest clusters (seeds stay
    * home-assigned — the IVF index/query split), recovering seed
    * neighbors across cluster boundaries that single-probe bounding
    * misses (q156 measures exactly that gap). The operating point is no
    * longer a hand-picked constant: `nprobe =
    * [[graft.ext.Similarity.nprobeFor]](0.8, 2000)` = 3 — the smallest
    * probe count whose MEASURED propagation recall meets 0.8 on the
    * committed `tools/RecallCompare` grid at its 1× audited scale
    * (0.834 at nprobe 3 vs 0.588 at 1). The sizing argument is pinned
    * to that audited scale (not the runtime corpus) so the derived
    * constant — and with it the static oracle and cross-scale sweep
    * comparability — stays fixed; re-deriving at a deployment scale is
    * a fresh RecallCompare sweep plus a re-registration, by design.
    * Candidates stay cluster-bounded — the quadratic term triples,
    * never reverts to seeds×corpus — and each (target, seed) pair
    * still forms at most once, so the decision path (integer votes,
    * 6dp cosines, best-cosine tie-break) is unchanged and the oracle
    * replays it hash-exactly with a top-3 probe CTE.
    */
  def q157KnnLabelsMultiprobe(spark: SparkSession, dir: String): DataFrame =
    Similarity.knnLabelPropagation(Tables.load(spark, dir, "embeddings"),
      isSeed = col("vec_id") % 3 === 0,
      nprobe = Similarity.nprobeFor(targetRecall = 0.8, n = 2000L))

  /** Batched IVF search on the K-MEANS quantizer
    * ([[graft.ext.Similarity.kmeansCentroidsExact]], 2 Lloyd rounds) —
    * the round-11 gap closed: k-means existed but only the seed sample
    * was graded, because float Lloyd means are reduction-order-
    * dependent and can never hash-match an external replay. The exact
    * variant computes each per-bucket mean from 6dp fixed-point INTEGER
    * sums (order-independent, `SUM(CAST(ROUND(x·10⁶) AS BIGINT))` in
    * the oracle) + one double division + one IEEE float cast, so DuckDB
    * replays both Lloyd rounds and the final assignment bit-exactly —
    * and `tools/RecallCompare` measures its recall IDENTICAL to float
    * k-means at 2 iterations (0.3845 vs 0.3845 at sf0.1, 0.2328 vs
    * 0.2328 at 30×) and above the seed sample (+6 points sf0.1,
    * +1.5 points 30×). q132 (seed sample) stays registered as the
    * zero-build-cost operating point; this is the refined one.
    */
  def q158IvfKmeansBatch(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val nlist = Similarity.indexParams(emb.count()).nlist
    val centroids = Similarity.kmeansCentroidsExact(emb, nlist, iters = 2)
    val queries = emb.filter(col("vec_id") % 500 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    Similarity.ivfTopKBatch(Similarity.assignBuckets(emb, centroids),
      centroids, queries, k = 10, nprobe = 3)
  }

  /** Ingest-form kNN labeling
    * ([[graft.ext.Similarity.knnLabelsAgainstSeeds]]): the q155
    * decisions restructured around a FIXED seed index — quantizer
    * (derived ⌈√Nseeds⌉ from the seed slice) and degenerate-cluster cap
    * from the seed corpus alone, targets flowing through statelessly —
    * the shape a deployment serves and the one
    * [[graft.ext.Similarity.streamingKnnLabelIngest]] runs per
    * micro-batch (per-target decisions read only the seed index, so the
    * output is micro-batch composable, spec-pinned). The q133→q135 move
    * applied to the mining family: q155 audits whole-corpus
    * propagation, this audits the serving path.
    */
  def q159KnnLabelsIngest(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val seeds = emb.filter(col("vec_id") % 3 === 0)
    val centroids = Similarity.sampleCentroids(seeds,
      Similarity.indexParams(seeds.count()).nlist)
    Similarity.knnLabelsAgainstSeeds(seeds,
      emb.filter(col("vec_id") % 3 =!= 0), centroids)
  }

  /** Frozen-index margin mining
    * ([[graft.ext.Similarity.marginMineAgainstSeeds]]): q154's mining
    * decisions restructured around a FIXED seed-side index — quantizer
    * (derived ⌈√Nseeds⌉ from the label-1 slice), degenerate-cluster cap,
    * AND the seed-side hubness statistics (each seed's top-4
    * same-cluster seed neighbors, a build-time artifact the index
    * ships) all derive from the seed corpus alone, so arriving label-0
    * source batches are mined statelessly at nprobe=2 and the output is
    * micro-batch composable (spec-pinned; the shape
    * [[graft.ext.Similarity.streamingMarginMineIngest]] runs per
    * micro-batch). The q133→q135→q159 deployment move applied to
    * mining: q154 audits the whole-corpus compaction, this audits the
    * serving path.
    *
    * `nprobe` is DERIVED (round 15, closing the rule's first
    * exception): [[graft.ext.Similarity.nprobeForMining]] reads the
    * measured mining-decision recall grid
    * (`tools/RecallCompare`'s `mining_q160` column on the mixed-label
    * planted-cluster fixture) at the grid's audited 1× scale — the same
    * pinned-scale convention as q157, so the constant (and the static
    * oracle, and cross-scale sweep comparability) stays fixed;
    * 0.8-target recall resolves to nprobe = 8 — the operating point is
    * (recall 0.925, precision 0.935) at 1×
    * ([[graft.ext.Similarity.miningPrecisionAt]]). Live-N policy: a
    * SERVING deployment at a different corpus scale re-derives its
    * probe width from the live seed count —
    * `nprobeForMining(0.8, liveN)` — because measured recall at a
    * FIXED nprobe falls as the corpus grows (0.58 at the 200k grid
    * row for nprobe 8); only graded artifacts pin the audited 1×
    * derivation so the oracle and cross-scale sweeps stay comparable.
    */
  def q160MarginMiningIngest(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val seeds = emb.filter(col("label") === 1)
    val centroids = Similarity.sampleCentroids(seeds,
      Similarity.indexParams(seeds.count()).nlist)
    Similarity.marginMineAgainstSeeds(seeds, emb.filter(col("label") === 0),
      centroids,
      nprobe = Similarity.nprobeForMining(targetRecall = 0.8, n = 2000L))
  }

  /** Rank-quantile z-order key over a WIDE integral domain — q102's
    * layout key where one dimension is a surrogate key spread past
    * 2^53 (`(l_orderkey mod 2^22)·2^40 + l_partkey` — the composite-id
    * shape real fact tables carry), the domain where the broadcast
    * form's former double-cast boundary probe silently merged adjacent
    * keys (double's 53-bit mantissa rounds ~2^62 values to multiples
    * of 2^9, collapsing partkey deltas below 512). The round-14
    * long-typed boundary kernel (`sorted_bucket_of_long`, see
    * `Layout.broadcastBucketCol`) keeps the join-free layout path
    * exact over the full 64-bit range; the oracle replays the
    * equi-depth histogram ranking in exact BIGINT arithmetic, so any
    * precision loss in the engine's probe would hash-mismatch.
    */
  def q161ZorderQuantileWide(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        ((col("l_orderkey") % lit(1L << 22)) * lit(1L << 40)
          + col("l_partkey")).as("wide_key"),
        col("l_suppkey"))
    graft.sources.Layout.withZorderKeyQuantile(df, "wide_key", "l_suppkey",
      bits = 5, zCol = "zq")
      .select(col("l_orderkey"), col("l_linenumber"), col("zq"))
  }

  /** Cap accounting for the SemDeDup family
    * ([[graft.ext.Similarity.semanticDedupCapStats]]) — the
    * no-silent-caps rule made a graded artifact: one row per quantizer
    * sizing reporting how many clusters the 10000-row degenerate-cluster
    * guard drops and how much corpus mass vanishes with them. The
    * `fixed_m8` row documents why round 15 retired q89's m=8
    * registration: at 100× every 25k-vector bucket exceeds the cap, so
    * dropped_vectors = total_vectors and the "fast" sweep row measured a
    * corpus silently thrown away; the `derived_sqrtn` row (q89's current
    * sizing) keeps clusters at ~√N ≪ cap, so its dropped mass stays 0 at
    * every committed scale. One assignment pass + one aggregation per
    * sizing — never quadratic, so the report itself is cheap at any
    * scale.
    */
  def q162SemanticDedupCapReport(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val fixed = Similarity.sampleCentroids(emb, m = 8)
    val nlist = Similarity.indexParams(emb.count()).nlist
    val derived = Similarity.kmeansCentroidsExact(emb, nlist, iters = 2)
    Similarity.semanticDedupCapStats(emb, fixed)
      .withColumn("sizing", lit("fixed_m8"))
      .unionByName(Similarity.semanticDedupCapStats(emb, derived)
        .withColumn("sizing", lit("derived_sqrtn")))
      .select(col("sizing"), col("n_buckets"), col("capped_buckets"),
        col("dropped_vectors"), col("total_vectors"))
  }

  /** Rank-quantile z-order with a TIME-typed dimension — the round-15
    * long-kernel routing's graded consumer: timestamps are the
    * skew-heavy layout dimension real fact tables cluster on
    * (time × price here), and `Layout.broadcastBucketCol` now probes
    * them through the exact `unix_micros` long image instead of
    * falling back to two corpus-sized joins. The fixture's parquet
    * carries unadjusted-µs timestamps, which Spark reads as
    * TIMESTAMP_NTZ; the cast to TIMESTAMP is the identity on the
    * clock face under the UTC session and lands the column on the
    * kernel path (NTZ itself deliberately stays on the join path —
    * see the Layout scaladoc). Same join-free 0-shuffle/1-scan plan
    * as q102/q161; the oracle ranks the naive timestamp directly
    * (identical total order).
    */
  def q163ZorderQuantileTime(spark: SparkSession, dir: String): DataFrame = {
    // The NTZ→TIMESTAMP cast below is rank-preserving ONLY under a UTC
    // session: across a DST transition the wall-clock→instant cast is
    // non-monotone (the exact hazard that keeps NTZ itself on Layout's
    // join path). Fail loudly instead of bucketing divergently.
    require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "q163 requires spark.sql.session.timeZone=UTC — the NTZ cast is " +
        "non-monotone across DST in other zones")
    val df = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("timestamp").as("ship_ts"),
        col("l_extendedprice"))
    graft.sources.Layout.withZorderKeyQuantile(df, "ship_ts",
        "l_extendedprice", bits = 5, zCol = "zq")
      .select(col("l_orderkey"), col("l_linenumber"), col("zq"))
  }

  /** The mining recall audit as a GRADED artifact
    * ([[graft.ext.Similarity.marginMiningRecallAudit]]): per
    * budget-audited label-0 source, the exact frozen-index mining
    * decision (candidates = source × ALL index seeds) next to the
    * bucketed decision at q160's derived nprobe-8 operating point, with
    * recovered AND spurious flags (round-16: Σ recovered / Σ exact is
    * the recall and Σ recovered / (Σ recovered + Σ spurious) the
    * PRECISION, so the graded artifact prices both directions — the
    * narrower candidate net can invent sub-threshold mines, a ~22%
    * fraction at the 1× grid point that recall alone never surfaces).
    * Every other recall-audit family is a registered
    * oracle-checked query (q78 rproj, q137/q152 IVF, q156 propagation);
    * this closes the asymmetry for mining — the DuckDB oracle replays
    * BOTH arms end-to-end: the q160 seed-side prefix, the md5-hash
    * audited cut (q152's idiom), and the identical integer-exact margin
    * decision chain twice. On the driver fixture every audited source
    * mines exactly (uniform vectors — margins cluster near 1), so the
    * result is decision-dense; the cross-fixture recall curve lives in
    * recall_compare_r15.json and the derived grid.
    */
  def q164MiningRecallAudit(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val seeds = emb.filter(col("label") === 1)
    val centroids = Similarity.sampleCentroids(seeds,
      Similarity.indexParams(seeds.count()).nlist)
    Similarity.marginMiningRecallAudit(seeds, emb.filter(col("label") === 0),
      centroids,
      nprobe = Similarity.nprobeForMining(targetRecall = 0.8, n = 2000L))
  }

  // ------------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_project" -> (q02FilterProject _),
    "q03_join_agg" -> (q03JoinAgg _),
    "q04_multiway_revenue" -> (q04MultiwayRevenue _),
    "q05_top_orders" -> (q05TopOrders _),
    "q06_distinct" -> (q06Distinct _),
    "q07_window_rank" -> (q07WindowRank _),
    "q08_semi_join" -> (q08SemiJoin _),
    "q09_anti_join" -> (q09AntiJoin _),
    "q10_set_ops" -> (q10SetOps _),
    "q11_rollup" -> (q11Rollup _),
    "q12_scalar_funcs" -> (q12ScalarFuncs _),
    "q13_date_parts" -> (q13DateParts _),
    "q14_case_agg" -> (q14CaseAgg _),
    "q15_event_minute_counts" -> (q15EventMinuteCounts _),
    "q16_latest_per_user" -> (q16LatestPerUser _),
    "q17_j1_snapshots" -> (q17J1Snapshots _),
    "q18_window_counts" -> (q18WindowCounts _),
    "q19_document_projection" -> (q19DocumentProjection _),
    "q20_dedup_exact" -> (q20DedupExact _),
    "q21_text_stats" -> (q21TextStats _),
    "q22_lang_stats" -> (q22LangStats _),
    "q23_lang_id" -> (q23LangId _),
    "q24_quality" -> (q24Quality _),
    "q25_ann_topk" -> (q25AnnTopK _),
    "q26_embedding_stats" -> (q26EmbeddingStats _),
    "q27_subword_counts" -> (q27SubwordCounts _),
    "q28_event_props" -> (q28EventProps _),
    "q29_sessions" -> (q29Sessions _),
    "q30_minhash_pairs" -> (q30MinHashPairs _),
    "q31_simhash_pairs" -> (q31SimHashPairs _),
    "q32_cosine_near_dups" -> (q32CosineNearDups _),
    "q33_ivf_topk" -> (q33IvfTopK _),
    "q61_ivf_indexed" -> (q61IvfIndexed _),
    "q34_media_features" -> (q34MediaFeatures _),
    "q35_rolling_hash" -> (q35RollingHash _),
    "q36_d1_parse" -> (q36D1Parse _),
    "q37_salted_count" -> (q37SaltedCount _),
    "q38_distinct_agg" -> (q38DistinctAgg _),
    "q39_cube" -> (q39Cube _),
    "q40_asof_join" -> (q40AsofJoin _),
    "q41_sql_api" -> (q41SqlApi _),
    "q42_drop_near_dups" -> (q42DropNearDups _),
    "q43_analytics" -> (q43Analytics _),
    "q44_full_outer" -> (q44FullOuter _),
    "q45_variant_props" -> (q45VariantProps _),
    "q46_percentiles" -> (q46Percentiles _),
    "q47_pivot" -> (q47Pivot _),
    "q48_regex_funcs" -> (q48RegexFuncs _),
    "q49_string_agg" -> (q49StringAgg _),
    "q50_centroids" -> (q50Centroids _),
    "q51_range_join" -> (q51RangeJoin _),
    "q52_except_intersect" -> (q52ExceptIntersect _),
    "q53_doc_freq" -> (q53DocFreq _),
    "q54_grouping_sets" -> (q54GroupingSets _),
    "q55_scalar_null" -> (q55ScalarNull _),
    "q56_session_window" -> (q56SessionWindow _),
    "q57_sliding_window" -> (q57SlidingWindow _),
    "q58_minmax_by" -> (q58MinMaxBy _),
    "q59_window_counts_country" -> (q59WindowCountsCountry _),
    "q60_cc_dedup" -> (q60CcDedup _),
    "q62_corpus_curation" -> (q62CorpusCuration _),
    "q63_quantize_int8" -> (q63QuantizeInt8 _),
    "q64_contamination" -> (q64Contamination _),
    "q65_stratified_sample" -> (q65StratifiedSample _),
    "q66_tfidf_terms" -> (q66TfIdfTerms _),
    "q67_pack_chunks" -> (q67PackChunks _),
    "q68_ivf_sq8" -> (q68IvfSq8 _),
    "q69_repetition_signals" -> (q69RepetitionSignals _),
    "q70_doc_chunks" -> (q70DocChunks _),
    "q71_mixture_resample" -> (q71MixtureResample _),
    "q72_rproj_topk" -> (q72RprojTopK _),
    "q73_vocab_coverage" -> (q73VocabCoverage _),
    "q74_cc_best_keep" -> (q74CcBestKeep _),
    "q75_contamination_report" -> (q75ContaminationReport _),
    "q76_rproj_indexed" -> (q76RprojIndexed _),
    "q77_est_calibration" -> (q77EstCalibration _),
    "q78_rproj_recall" -> (q78RprojRecall _),
    "q79_chunk_manifest" -> (q79ChunkManifest _),
    "q80_rare_token_ratio" -> (q80RareTokenRatio _),
    "q81_corpus_summary" -> (q81CorpusSummary _),
    "q82_dup_histogram" -> (q82DupHistogram _),
    "q83_source_scorecard" -> (q83SourceScorecard _),
    "q84_ngram_jaccard" -> (q84NgramJaccard _),
    "q85_sketch_audit" -> (q85SketchAudit _),
    "q86_bloom_contamination" -> (q86BloomContamination _),
    "q87_heavy_hitters" -> (q87HeavyHitters _),
    "q88_pii_scrub" -> (q88PiiScrub _),
    "q89_semantic_dedup" -> (q89SemanticDedup _),
    "q90_incremental_dedup" -> (q90IncrementalDedup _),
    "q91_quality_budget" -> (q91QualityBudget _),
    "q92_containment_pairs" -> (q92ContainmentPairs _),
    "q93_media_frames" -> (q93MediaFrames _),
    "q94_fuzzy_join" -> (q94FuzzyJoin _),
    "q95_source_overlap" -> (q95SourceOverlap _),
    "q96_boilerplate_scrub" -> (q96BoilerplateScrub _),
    "q97_event_transitions" -> (q97EventTransitions _),
    "q98_incremental_scrub" -> (q98IncrementalScrub _),
    "q99_adaptive_gate" -> (q99AdaptiveGate _),
    "q100_shuffled_export" -> (q100ShuffledExport _),
    "q101_zorder_key" -> (q101ZorderKey _),
    "q102_zorder_quantile" -> (q102ZorderQuantile _),
    "q103_substring_pairs" -> (q103SubstringPairs _),
    "q104_bpe_pairs" -> (q104BpePairs _),
    "q105_pq_topk" -> (q105PqTopK _),
    "q106_pq_indexed" -> (q106PqIndexed _),
    "q107_incr_substring" -> (q107IncrementalSubstring _),
    "q108_lm_perplexity" -> (q108LmPerplexity _),
    "q109_nb_langid" -> (q109NbLangid _),
    "q110_hard_negatives" -> (q110HardNegatives _),
    "q111_lm_admission" -> (q111LmAdmission _),
    "q112_bpe_encode" -> (q112BpeEncode _),
    "q113_snapshot_drift" -> (q113SnapshotDrift _),
    "q114_cluster_prune" -> (q114ClusterPrune _),
    "q115_substring_scrub" -> (q115SubstringScrub _),
    "q116_incremental_scrub" -> (q116IncrementalScrub _),
    "q117_winnow_pairs" -> (q117WinnowPairs _),
    "q118_weighted_sample" -> (q118WeightedSample _),
    "q119_hilbert_key" -> (q119HilbertKey _),
    "q120_length_batches" -> (q120LengthBatches _),
    "q121_leakage_split" -> (q121LeakageSplit _),
    "q122_dsir_sample" -> (q122DsirSample _),
    "q123_fertility_audit" -> (q123FertilityAudit _),
    "q124_crossdup_matrix" -> (q124CrossdupMatrix _),
    "q125_epoch_plan" -> (q125EpochPlan _),
    "q126_repetition_scrub" -> (q126RepetitionScrub _),
    "q127_pq_rerank" -> (q127PqRerank _),
    "q128_bm25_topk" -> (q128Bm25TopK _),
    "q129_dsir_ess" -> (q129DsirEss _),
    "q130_stratified_holdout" -> (q130StratifiedHoldout _),
    "q131_threshold_curve" -> (q131ThresholdCurve _),
    "q132_ivf_batch" -> (q132IvfBatch _),
    "q133_incr_cosine_dedup" -> (q133IncrCosineDedup _),
    "q134_image_decode" -> (q134ImageDecode _),
    "q135_incr_cosine_snapshot" -> (q135IncrCosineSnapshot _),
    "q136_nb_calibration" -> (q136NbCalibration _),
    "q137_ivf_recall" -> (q137IvfRecall _),
    "q141_audio_decode" -> (q141AudioDecode _),
    "q142_video_frames" -> (q142VideoFrames _),
    "q143_image_resize" -> (q143ImageResize _),
    "q144_hll_distinct" -> (q144HllDistinct _),
    "q145_cms_heavy_hitters" -> (q145CmsHeavyHitters _),
    "q146_hist_quantiles" -> (q146HistQuantiles _),
    "q147_hll_overlap" -> (q147HllOverlap _),
    "q148_rrf_fusion" -> (q148RrfFusion _),
    "q149_pagerank_centrality" -> (q149PagerankCentrality _),
    "q150_triangle_census" -> (q150TriangleCensus _),
    "q151_edge_support" -> (q151EdgeSupport _),
    "q152_ivf_recall_sampled" -> (q152IvfRecallSampled _),
    "q153_jpeg_reencode" -> (q153JpegReencode _),
    "q154_margin_mining" -> (q154MarginMining _),
    "q155_knn_labels" -> (q155KnnLabels _),
    "q156_knn_recall" -> (q156KnnRecall _),
    "q157_knn_labels_multiprobe" -> (q157KnnLabelsMultiprobe _),
    "q158_ivf_kmeans_batch" -> (q158IvfKmeansBatch _),
    "q159_knn_labels_ingest" -> (q159KnnLabelsIngest _),
    "q160_margin_mining_ingest" -> (q160MarginMiningIngest _),
    "q161_zorder_quantile_wide" -> (q161ZorderQuantileWide _),
    "q162_semdedup_cap_report" -> (q162SemanticDedupCapReport _),
    "q163_zorder_quantile_time" -> (q163ZorderQuantileTime _),
    "q164_mining_recall_audit" -> (q164MiningRecallAudit _))

  /** The q122 DSIR scoring chain — hashed unigram+bigram buckets, the
    * two smoothed bag models from one conditional aggregate, per-doc
    * importance log-weights — shared by the selection final (q122) and
    * the ESS diagnostics final (q129).
    */
  private def DsirScoreCtes: String =
    """WITH tok AS (
           SELECT doc_id, lang,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
           FROM documents),
         feat AS (
           SELECT doc_id, lang, unnest(list_concat(toks,
             CASE WHEN len(toks) >= 2 THEN
               list_transform(range(1, len(toks)), i ->
                 toks[CAST(i AS INTEGER)] || '_' || toks[CAST(i AS INTEGER) + 1])
             ELSE CAST([] AS VARCHAR[]) END)) AS f
           FROM tok),
         fb AS (
           SELECT doc_id, lang,
             ('0x' || substr(md5(f), 1, 15))::BIGINT % 1024 AS bkt
           FROM feat),
         cnt AS (
           SELECT bkt, COUNT(*) AS raw_n,
             COUNT(*) FILTER (WHERE lang = 'en') AS tgt_n
           FROM fb GROUP BY bkt),
         tot AS (SELECT SUM(raw_n) AS rtot, SUM(tgt_n) AS ttot FROM cnt),
         lr AS (
           SELECT bkt,
             ln((tgt_n + 1.0) / (ttot + 1024.0))
               - ln((raw_n + 1.0) / (rtot + 1024.0)) AS lr
           FROM cnt, tot),
         score AS (
           SELECT doc_id, SUM(lr) AS logw
           FROM fb JOIN lr USING (bkt) GROUP BY doc_id)"""

  /** DuckDB replay of the whole q112 BPE pipeline (`Bpe.train` on the 80%
    * split → `Bpe.encodeCorpus` over the full corpus) as plain SQL. Two
    * observations make greedy BPE SQL-expressible:
    *
    *  - ONE merge applied greedily left-to-right without overlap is
    *    exactly SQL `replace()` over a separator-wrapped symbol string:
    *    each symbol is wrapped `chr(31)sym chr(31)` so the pair pattern
    *    `ab` can only match whole-symbol
    *    boundaries, and a replacement's trailing wrapper cannot seed an
    *    overlapping follow-on match ("a a a a" under (a,a) → [aa, aa],
    *    not [aa, a, a]).
    *  - the `nMerges` training rounds are data-dependent but FIXED in
    *    count, so they unroll to chained MATERIALIZED CTEs (materialized
    *    is load-bearing: round i is referenced by round i+1 AND the
    *    encode chain, so inlining would re-derive the prefix 2^n times).
    *
    * The per-round argmax mirrors the trainer's deterministic cut
    * (cnt DESC, then (sym1, sym2) in binary collation on both engines)
    * and `minPairCount = 2` is the `cnt >= 2 … LIMIT 1` filter — an
    * empty best-row leaves the vocab unchanged, so every later round is
    * a no-op, exactly the trainer's early stop. The encode side applies
    * the same merge chain to every corpus word directly (training-
    * consistent segmentation: on in-vocab words this reproduces the
    * trained `syms` exactly, and OOV words ARE the merge replay), then
    * left-joins the per-doc aggregate back onto `documents` so empty
    * documents keep a zero row, matching `Bpe.encodeCorpus`.
    */
  private def bpeOracleCtes(nMerges: Int): String = {
    val S = "chr(31)"
    val wrap = (w: String) =>
      s"$S || array_to_string(string_split($w, ''), $S || $S) || $S"
    val mergeStep = (src: String, i: Int, cols: String) =>
      s"""  SELECT $cols,
    CASE WHEN b.sym1 IS NULL THEN s
    ELSE replace(s, $S || b.sym1 || $S || $S || b.sym2 || $S,
                    $S || b.sym1 || b.sym2 || $S) END AS s
  FROM $src LEFT JOIN b$i b ON TRUE"""
    val head = s"""w AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
  FROM documents WHERE doc_id % 10 < 8),
wf AS MATERIALIZED (SELECT word, COUNT(*) AS f FROM w GROUP BY word),
v0 AS MATERIALIZED (SELECT word, f, ${wrap("word")} AS s FROM wf)"""
    val rounds = (0 until nMerges).map { i =>
      s"""pc$i AS (
  SELECT L[CAST(i AS INTEGER)] AS sym1, L[CAST(i AS INTEGER)+1] AS sym2,
    SUM(f) AS cnt
  FROM (SELECT f, L, unnest(range(1, length(L))) AS i FROM
    (SELECT f, string_split(trim(s, $S), $S || $S) AS L FROM v$i)
    WHERE length(L) >= 2)
  GROUP BY 1, 2),
b$i AS MATERIALIZED (SELECT sym1, sym2 FROM pc$i WHERE cnt >= 2
  ORDER BY cnt DESC, sym1 ASC, sym2 ASC LIMIT 1),
v${i + 1} AS MATERIALIZED (
${mergeStep(s"v$i", i, "word, f")})"""
    }
    val encHead = s"""e0 AS MATERIALIZED (
  SELECT doc_id, word, ${wrap("word")} AS s
  FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        FROM documents))"""
    val encRounds = (0 until nMerges).map { i =>
      s"""e${i + 1} AS MATERIALIZED (
${mergeStep(s"e$i", i, "doc_id, word")})"""
    }
    (Seq(head) ++ rounds ++ Seq(encHead) ++ encRounds).mkString(
      "WITH ", ",\n", "") + s""",
enc AS (
  SELECT e.doc_id,
    length(string_split(trim(e.s, $S), $S || $S)) AS ntok,
    (wf.word IS NULL) AS oov
  FROM e$nMerges e LEFT JOIN wf ON e.word = wf.word),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
    CAST(SUM(ntok) AS BIGINT) AS n_bpe_tokens,
    CAST(SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov_words
  FROM enc GROUP BY doc_id)
"""
  }

  private def bpeEncodeOracle(nMerges: Int): String =
    bpeOracleCtes(nMerges) + """
SELECT d.doc_id, COALESCE(a.n_words, 0) AS n_words,
  COALESCE(a.n_bpe_tokens, 0) AS n_bpe_tokens,
  COALESCE(a.n_oov_words, 0) AS n_oov_words
FROM (SELECT doc_id FROM documents) d LEFT JOIN agg a USING (doc_id)"""

  /** Per-source roll-up of the q112 merge-replay chain — the q123 oracle.
    * Every doc in the corpus has ≥ 1 word, so the inner join against
    * `agg` is total; sums stay integral until the two ROUND(…, 6)
    * ratios, mirroring the Spark aggregate exactly.
    */
  private def bpeFertilityOracle(nMerges: Int): String =
    bpeOracleCtes(nMerges) + """
SELECT d.source, COUNT(*) AS n_docs,
  CAST(SUM(a.n_words) AS BIGINT) AS n_words,
  CAST(SUM(a.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
  ROUND(CAST(SUM(a.n_bpe_tokens) AS DOUBLE) / CAST(SUM(a.n_words) AS DOUBLE), 6)
    AS fertility,
  ROUND(CAST(SUM(d.n_chars) AS DOUBLE) / CAST(SUM(a.n_bpe_tokens) AS DOUBLE), 6)
    AS chars_per_token,
  ROUND(CAST(SUM(a.n_oov_words) AS DOUBLE) / CAST(SUM(a.n_words) AS DOUBLE), 6)
    AS oov_rate
FROM documents d JOIN agg a USING (doc_id)
GROUP BY d.source"""

  /** DuckDB oracle SQL per query (omitted keys → driver rows-only check). */
  val oracles: Map[String, String] = Map(
    "q112_bpe_encode" -> bpeEncodeOracle(12),
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS cnt
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_quantity > 45 AND l_returnflag = 'R'""",
    "q03_join_agg" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q04_multiway_revenue" ->
      """SELECT r_name, n_name,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "q05_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q06_distinct" ->
      "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    "q07_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders) WHERE rn = 1""",
    "q08_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')""",
    "q09_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q10_set_ops" ->
      """SELECT c_nationkey AS nationkey FROM customer
         UNION SELECT s_nationkey AS nationkey FROM supplier""",
    "q11_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q12_scalar_funcs" ->
      """SELECT p_partkey, UPPER(SUBSTRING(p_name, 1, 10)) AS name10,
         CAST(LENGTH(p_name) AS INTEGER) AS name_len,
         CONCAT_WS('-', p_brand, p_type) AS brand_type,
         p_size * 2 + 1 AS size_calc FROM part""",
    "q13_date_parts" ->
      """SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS y,
         CAST(MONTH(o_orderdate) AS INTEGER) AS m,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY 1, 2""",
    "q14_case_agg" ->
      """SELECT o_orderpriority,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
         CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
         COUNT(*) AS cnt
         FROM orders GROUP BY o_orderpriority""",
    "q15_event_minute_counts" ->
      """SELECT epoch_ns(ts) // 60000000000 AS epoch_min, event_type,
         COUNT(*) AS cnt FROM events GROUP BY 1, 2""",
    "q16_latest_per_user" ->
      """SELECT user_id, event_id, event_type, value FROM (
           SELECT user_id, event_id, event_type, value,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1""",
    "q17_j1_snapshots" ->
      """WITH oc AS (SELECT o_custkey, COUNT(*) AS c FROM orders GROUP BY o_custkey)
         SELECT c_custkey AS user_id,
                1 + COALESCE(c, 0) AS n_snapshots,
                COALESCE((c * (c + 1)) // 2, 0) AS n_addr_rows_emitted,
                COALESCE(c, 0) AS n_addresses_final
         FROM customer LEFT JOIN oc ON c_custkey = o_custkey""",
    "q18_window_counts" ->
      """SELECT CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) AS window_start_sec,
         o_orderpriority AS state, COUNT(*) AS cnt
         FROM orders GROUP BY 1, 2""",
    "q19_document_projection" ->
      """SELECT c_custkey AS userId, c_name AS userName,
         c_mktsegment AS genre, n_name AS country
         FROM customer JOIN nation ON c_nationkey = n_nationkey""",
    "q20_dedup_exact" ->
      """SELECT md5(LOWER(TRIM(text))) AS fingerprint,
         MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
         FROM documents GROUP BY 1""",
    "q21_text_stats" ->
      """SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars_calc,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
         FROM documents""",
    "q22_lang_stats" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
         FROM documents GROUP BY lang, source""",
    "q23_lang_id" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS toks
           FROM documents),
         h AS (
           SELECT doc_id,
             len(list_filter(toks, x -> list_contains(['the','and','of','to','is'], x))) AS h_en,
             len(list_filter(toks, x -> list_contains(['der','die','und','das','ist'], x))) AS h_de,
             len(list_filter(toks, x -> list_contains(['le','la','et','les','est'], x))) AS h_fr,
             len(list_filter(toks, x -> list_contains(['el','los','las','una','es'], x))) AS h_es,
             len(list_filter(toks, x -> list_contains(['de5','shi4','le5','zai4','he2'], x))) AS h_zh
           FROM t)
         SELECT doc_id,
           CASE WHEN GREATEST(h_en, h_de, h_fr, h_es, h_zh) = 0 THEN 'und'
                WHEN h_en = GREATEST(h_en, h_de, h_fr, h_es, h_zh) THEN 'en'
                WHEN h_de = GREATEST(h_en, h_de, h_fr, h_es, h_zh) THEN 'de'
                WHEN h_fr = GREATEST(h_en, h_de, h_fr, h_es, h_zh) THEN 'fr'
                WHEN h_es = GREATEST(h_en, h_de, h_fr, h_es, h_zh) THEN 'es'
                ELSE 'zh' END AS lang_pred
         FROM h""",
    "q24_quality" ->
      """WITH t AS (SELECT doc_id, text,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks,
             list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS ltoks
           FROM documents),
         s AS (SELECT doc_id,
             LEAST(len(toks) / 20.0, 1.0) AS len_score,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) / length(text)
             END AS punct_ratio,
             CASE WHEN len(ltoks) = 0 THEN 0.0
                  ELSE len(list_filter(ltoks, x -> list_contains(
                         ['the','a','an','and','or','of','to','in','is','it',
                          'for','on','with','as','at','by','from','that','this'], x))) / len(ltoks)
             END AS sw_ratio
           FROM t)
         SELECT doc_id,
           ROUND(len_score * 0.5 + (1.0 - LEAST(punct_ratio * 4.0, 1.0)) * 0.25
                 + LEAST(sw_ratio * 5.0, 1.0) * 0.25, 6) AS quality
         FROM s""",
    "q25_ann_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         SELECT vec_id FROM (
           SELECT e.vec_id,
             list_sum(list_transform(range(1, len(e.embedding) + 1),
               k -> CAST(e.embedding[k] AS DOUBLE) * CAST(q.qe[k] AS DOUBLE))) /
             (NULLIF(sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                 k -> CAST(e.embedding[k] AS DOUBLE) * CAST(e.embedding[k] AS DOUBLE)))) *
               sqrt(list_sum(list_transform(range(1, len(q.qe) + 1),
                 k -> CAST(q.qe[k] AS DOUBLE) * CAST(q.qe[k] AS DOUBLE)))), 0)) AS sim
           FROM embeddings e, q)
         ORDER BY sim DESC, vec_id ASC LIMIT 10""",
    "q27_subword_counts" ->
      """SELECT doc_id,
         CAST(len(list_filter(string_split_regex(text, '[^A-Za-z0-9]+'), x -> x <> '')) +
              len(list_filter(string_split_regex(text, '[A-Za-z0-9 ]+'), x -> x <> '')) AS BIGINT) AS n_subwords
         FROM documents""",
    "q26_embedding_stats" ->
      """SELECT label, COUNT(*) AS n_vecs,
         CAST(MAX(len(embedding)) AS BIGINT) AS dim,
         MIN(vec_id) AS min_id
         FROM embeddings GROUP BY label""",
    "q28_event_props" ->
      """SELECT CAST(props ->> '$.k' AS BIGINT) AS k, COUNT(*) AS cnt
         FROM events GROUP BY 1""",
    "q29_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS tns FROM events),
         m AS (SELECT user_id,
                 CASE WHEN LAG(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) IS NULL
                        OR tns - LAG(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) > 1800000000000
                      THEN 1 ELSE 0 END AS new_session
               FROM e)
         SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
                COUNT(*) AS n_events
         FROM m GROUP BY user_id""",
    "q36_d1_parse" ->
      """SELECT c_custkey AS userId, c_name AS name,
         c_name || '@example.org' AS email, c_mktsegment AS genre,
         CAST(1709618828 AS BIGINT) AS register_epoch
         FROM customer""",
    "q37_salted_count" ->
      "SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag",
    "q38_distinct_agg" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS cnt
         FROM events GROUP BY event_type""",
    "q39_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "q40_asof_join" ->
      """SELECT o_orderkey,
         (SELECT CAST(MAX(epoch_ns(ts)) AS BIGINT) FROM events
          WHERE user_id = o_custkey
            AND epoch_ns(ts) <= CAST(epoch(o_orderdate) AS BIGINT) * 1000000000)
           AS last_event_ns
         FROM orders""",
    "q41_sql_api" ->
      """SELECT c_mktsegment, COUNT(*) AS n_open,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS open_total
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_orderstatus = 'O'
         GROUP BY c_mktsegment""",
    "q43_analytics" ->
      """SELECT o_custkey, o_orderkey,
         LAG(o_orderkey, 1) OVER w AS prev_order,
         LEAD(o_orderkey, 1) OVER w AS next_order,
         CAST(RANK() OVER w AS INTEGER) AS rnk,
         CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
         CAST(NTILE(4) OVER w AS INTEGER) AS quartile
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""",
    "q44_full_outer" ->
      """SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
                COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
         FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
               FROM customer GROUP BY 1) c
         FULL OUTER JOIN
              (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
               FROM supplier GROUP BY 1) s
         ON c.nationkey = s.nationkey""",
    "q45_variant_props" ->
      """SELECT CAST(props ->> '$.k' AS BIGINT) AS k, COUNT(*) AS cnt,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1""",
    "q46_percentiles" ->
      """SELECT o_orderpriority,
         ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
         ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
         COUNT(*) AS cnt
         FROM orders GROUP BY o_orderpriority""",
    "q47_pivot" ->
      """SELECT o_orderpriority,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS "F",
         CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS "O",
         CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS "P"
         FROM orders GROUP BY o_orderpriority""",
    "q48_regex_funcs" ->
      """SELECT p_partkey,
         regexp_extract(p_type, '^([A-Z]+)', 1) AS first_word,
         regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
         CAST(regexp_matches(p_type, 'STEEL|BRASS') AS INTEGER) AS is_metal
         FROM part""",
    "q49_string_agg" ->
      """SELECT s_nationkey AS nationkey,
         string_agg(s_name, '|' ORDER BY s_name) AS names
         FROM supplier GROUP BY s_nationkey""",
    "q50_centroids" ->
      """SELECT label, CAST(pos - 1 AS INTEGER) AS pos,
         ROUND(AVG(CAST(v AS DOUBLE)), 4) AS m4
         FROM (SELECT label, unnest(embedding) AS v,
                      generate_subscripts(embedding, 1) AS pos
               FROM embeddings)
         GROUP BY label, pos""",
    "q51_range_join" ->
      """SELECT o_orderkey, COUNT(*) AS n_events,
         CAST(MAX(epoch_ns(ts)) AS BIGINT) AS max_ns
         FROM (SELECT o_orderkey, o_custkey,
                 CAST(epoch(o_orderdate) AS BIGINT) * 1000000000 AS o_ns
               FROM orders WHERE o_orderkey % 97 = 0) o
         JOIN events e ON e.user_id = o.o_custkey
           AND epoch_ns(e.ts) >= o.o_ns
           AND epoch_ns(e.ts) < o.o_ns + 604800 * CAST(1000000000 AS BIGINT)
         GROUP BY o_orderkey""",
    "q52_except_intersect" ->
      """SELECT nationkey, 'both' AS op FROM
           (SELECT c_nationkey AS nationkey FROM customer
            INTERSECT SELECT s_nationkey FROM supplier)
         UNION ALL
         SELECT nationkey, 'cust_only' AS op FROM
           (SELECT c_nationkey AS nationkey FROM customer
            EXCEPT SELECT s_nationkey FROM supplier)""",
    "q53_doc_freq" ->
      """SELECT term, COUNT(*) AS df FROM (
           SELECT doc_id, unnest(list_distinct(list_filter(string_split(lower(text), ' '), x -> x <> ''))) AS term
           FROM documents)
         GROUP BY term ORDER BY df DESC, term ASC LIMIT 20""",
    "q54_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""",
    "q55_scalar_null" ->
      """SELECT l_orderkey, l_linenumber,
         COALESCE(NULLIF(l_returnflag, 'N'), 'X') AS flag_or_x,
         LEAST(l_linenumber, 3) AS ln3,
         GREATEST(CAST(l_quantity AS BIGINT), 25) AS q25,
         CASE WHEN l_discount > 0.05 THEN 'HI' ELSE 'LO' END AS disc_band
         FROM lineitem""",
    "q56_session_window" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS tus FROM events),
         m AS (SELECT user_id, tus,
                 CASE WHEN LAG(tus) OVER w IS NULL
                        OR tus - LAG(tus) OVER w >= 1800000000 THEN 1 ELSE 0 END AS ns
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
         s AS (SELECT user_id, tus,
                 SUM(ns) OVER (PARTITION BY user_id ORDER BY tus
                               ROWS UNBOUNDED PRECEDING) AS sid
               FROM m)
         SELECT user_id, CAST(MIN(tus) AS BIGINT) AS session_start_us, COUNT(*) AS cnt
         FROM s GROUP BY user_id, sid""",
    "q57_sliding_window" ->
      """WITH e AS (SELECT event_type, epoch_ns(ts) // 1000 AS tus FROM events),
         w AS (SELECT event_type, tus,
                 unnest([(tus // 300000000) * 300000000,
                         (tus // 300000000) * 300000000 - 300000000]) AS ws
               FROM e)
         SELECT CAST(ws AS BIGINT) AS window_start_us, event_type, COUNT(*) AS cnt
         FROM w WHERE tus >= ws AND tus < ws + 600000000
         GROUP BY ws, event_type""",
    "q58_minmax_by" ->
      """WITH r AS (
           SELECT o_orderpriority, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
           FROM orders)
         SELECT o_orderpriority,
           MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS top_order,
           MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS bottom_order,
           COUNT(*) AS cnt
         FROM r GROUP BY o_orderpriority""",
    "q59_window_counts_country" ->
      """SELECT CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) AS window_start_sec,
         o_orderstatus AS country, COUNT(*) AS cnt
         FROM orders GROUP BY 1, 2""",
    "q30_minhash_pairs" -> (MinHashOracleCtes +
      "SELECT id1, id2, ROUND(jaccard, 6) AS jaccard FROM pairs WHERE jaccard >= 0.5"),
    "q42_drop_near_dups" -> (MinHashOracleCtes +
      """SELECT doc_id FROM documents
         WHERE doc_id NOT IN (SELECT id2 FROM pairs WHERE jaccard >= 0.5)"""),
    "q31_simhash_pairs" ->
      """WITH tok AS (
           SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents),
         h AS (
           SELECT doc_id, list_transform(toks, tk -> ('0x' || substr(md5(tk),1,15))::BIGINT) AS hs FROM tok),
         s AS (
           SELECT doc_id,
             CAST(list_sum(list_transform(range(0, 60), j ->
               CASE WHEN list_sum(list_transform(hs, hh -> CASE WHEN (hh >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                    THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT) AS sh
           FROM h),
         banded AS (
           SELECT doc_id, sh, b, (sh >> CAST(b*15 AS INTEGER)) & 32767 AS band_key
           FROM s, range(0,4) t(b)
           -- mirror Spark's simHashPairs maxBucketSize=1000 skew guard
           QUALIFY COUNT(*) OVER (PARTITION BY b, band_key) <= 1000)
         SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2,
           CAST(bit_count(xor(l.sh, r.sh)) AS INTEGER) AS hamming
         FROM banded l JOIN banded r ON l.b = r.b AND l.band_key = r.band_key
         WHERE l.doc_id < r.doc_id AND bit_count(xor(l.sh, r.sh)) <= 16""",
    // q32 runs the AUTO band width (bands = 0); this oracle replays the
    // 4×16-bit configuration indexParams derives for every corpus up to
    // 2^16 vectors — which covers sf0.01 (where the oracle runs) and
    // sf0.1. Above 2^16 the query deliberately switches to 2×32 keys
    // (the collision-safety point of auto sizing); an oracle for that
    // regime would band by p // 32.
    "q32_cosine_near_dups" ->
      """WITH planes AS (
           SELECT p, list_transform(range(0, 64), k ->
             CASE WHEN (('0x' || substr(md5(p::VARCHAR || ',' || k::VARCHAR),1,15))::BIGINT & 1) = 1
                  THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END) AS pv
           FROM range(0, 64) t(p)),
         sb AS (
           SELECT e.vec_id, p.p,
             CASE WHEN list_sum(list_transform(range(1, len(e.embedding) + 1), k ->
                    p.pv[k] * CAST(e.embedding[k] AS DOUBLE))) >= 0 THEN 1 ELSE 0 END AS bit
           FROM embeddings e, planes p),
         bandkeys AS (
           SELECT vec_id, p // 16 AS band, CAST(SUM(bit * (1 << CAST(p % 16 AS INTEGER))) AS BIGINT) AS bits
           FROM sb GROUP BY vec_id, p // 16
           -- mirror Spark's cosineNearDupPairs maxBucketSize=10000 skew guard
           QUALIFY COUNT(*) OVER (PARTITION BY (p // 16), CAST(SUM(bit * (1 << CAST(p % 16 AS INTEGER))) AS BIGINT)) <= 10000),
         cand AS (
           SELECT DISTINCT l.vec_id AS id1, r.vec_id AS id2
           FROM bandkeys l JOIN bandkeys r ON l.band = r.band AND l.bits = r.bits
           WHERE l.vec_id < r.vec_id),
         wn AS (
           SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(range(1, len(embedding)+1), k ->
               CAST(embedding[k] AS DOUBLE) * CAST(embedding[k] AS DOUBLE)))) AS nrm
           FROM embeddings),
         scored AS (
           SELECT c.id1, c.id2,
             CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN 0.0
                  ELSE list_sum(list_transform(range(1, len(a.embedding)+1), k ->
                         CAST(a.embedding[k] AS DOUBLE) * CAST(b.embedding[k] AS DOUBLE))) / (a.nrm * b.nrm)
             END AS cos
           FROM cand c JOIN wn a ON c.id1 = a.vec_id JOIN wn b ON c.id2 = b.vec_id)
         SELECT id1, id2, ROUND(cos, 6) AS cos FROM scored WHERE cos >= 0.3""",
    "q33_ivf_topk" -> IvfTopKOracle,
    // q61 is the physically partitioned index path of the same IVF
    // algorithm — identical probe, scoring, and tie-break, so it replays
    // against the identical oracle.
    "q61_ivf_indexed" -> IvfTopKOracle,
    "q68_ivf_sq8" -> IvfSq8Oracle,
    // q132: the derived-⌈√N⌉ quantizer (production sizing — rounds 9–10
    // measured the fixed-nlist form quadratic at scale) — the oracle
    // computes nlist from its own count(*) and replays the same
    // assignment/probe/score chain
    "q132_ivf_batch" ->
      (ivfBatchCtesOf(ivfAsgCtesWith(AutoCentCte)) +
        " SELECT query_id, vec_id FROM annres"),
    // recall@10 of the q132 search vs the exact brute top-10 per query —
    // audited at the SAME derived-⌈√N⌉ operating point q132 runs, over
    // the 128 smallest-uniform-hash members of the q132 probe pool
    // (budgeted since round 12: the whole-pool form's brute side was
    // Q·N with Q ∝ corpus, the last N²-family plan in the registry)
    "q137_ivf_recall" ->
      (ivfBatchCtesOf(ivfAsgCtesWith(AutoCentCte),
        probePred = """vec_id % 500 = 0
                QUALIFY ROW_NUMBER() OVER (ORDER BY
                  ('0x' || substr(md5(vec_id::VARCHAR || ':recall'), 1, 15))::BIGINT
                    / 1152921504606846976.0 ASC, vec_id ASC) <= 128""") +
        RecallAuditTail),
    // q152: the budgeted-probe production form of the same audit — the
    // audited set is the 256 every-10th-pool queries with the smallest
    // md5 uniform (the exact-k holdout idiom), replaying the engine's
    // Sampling.uniformHash ranking exactly
    "q152_ivf_recall_sampled" ->
      (ivfBatchCtesOf(ivfAsgCtesWith(AutoCentCte),
        probePred = """vec_id % 10 = 0
                QUALIFY ROW_NUMBER() OVER (ORDER BY
                  ('0x' || substr(md5(vec_id::VARCHAR || ':recall'), 1, 15))::BIGINT
                    / 1152921504606846976.0 ASC, vec_id ASC) <= 256""") +
        RecallAuditTail),
    // q133/q135: direct and snapshot forms of the same admission —
    // identical decisions by construction (spec-pinned), same
    // whole-corpus replay, band width derived in SQL from count(*)
    // (the production `bands = 0` sizing — the fixed 8-bit test width
    // was measured quadratic at scale in rounds 9–10)
    "q133_incr_cosine_dedup" -> IncrCosineAutoOracle,
    "q135_incr_cosine_snapshot" -> IncrCosineAutoOracle,
    // PNG is lossless and the fixture images are solid-color with
    // id-derived dims/colors, so the decoded stats are closed-form in the
    // id — the oracle checks a REAL ImageIO encode→decode round-trip
    "q134_image_decode" ->
      """SELECT doc_id AS media_id,
           CAST(1 + doc_id % 7 AS INTEGER) AS width,
           CAST(1 + doc_id % 5 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS bands,
           CAST((doc_id * 37) % 256 AS DOUBLE) AS mean_r,
           CAST((doc_id * 59) % 256 AS DOUBLE) AS mean_g,
           CAST((doc_id * 83) % 256 AS DOUBLE) AS mean_b
         FROM documents""",
    // q154: margin-based mining replayed end-to-end — derived-⌈√N⌉
    // cluster assignment over the two label slices (ties to the larger
    // cid, the assignBuckets contract), cross-side within-cluster
    // candidates, 6dp-integer cosines, integer kNN sums, ONE double
    // division for the margin, forward-best per source vector
    "q154_margin_mining" ->
      """WITH sl AS (
           SELECT vec_id, embedding, (label = 0) AS is_src
           FROM embeddings WHERE label IN (0, 1)),
         cent AS (
           SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS cid,
             embedding
           FROM sl
           QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <=
             LEAST(65536, GREATEST(1,
               CAST(ceil(sqrt((SELECT COUNT(*) FROM sl))) AS BIGINT)))),
         cn AS (SELECT cid, embedding,
                 sqrt(list_sum(list_transform(range(1, len(embedding)+1), k ->
                   CAST(embedding[k] AS DOUBLE) * CAST(embedding[k] AS DOUBLE)))) AS nrm
                FROM cent),
         en AS (SELECT vec_id, embedding, is_src,
                 sqrt(list_sum(list_transform(range(1, len(embedding)+1), k ->
                   CAST(embedding[k] AS DOUBLE) * CAST(embedding[k] AS DOUBLE)))) AS nrm
                FROM sl),
         asg AS (
           SELECT e.vec_id, e.embedding, e.nrm, e.is_src,
             (SELECT c.cid FROM cn c
              ORDER BY CASE WHEN e.nrm * c.nrm = 0 THEN 0.0
                       ELSE list_sum(list_transform(range(1, len(e.embedding)+1), k ->
                              CAST(e.embedding[k] AS DOUBLE) * CAST(c.embedding[k] AS DOUBLE)))
                            / (e.nrm * c.nrm) END DESC,
                       c.cid DESC
              LIMIT 1) AS bucket
           FROM en e),
         ok AS (
           SELECT * FROM asg
           QUALIFY COUNT(*) OVER (PARTITION BY bucket) <= 10000),
         sc AS (
           SELECT x.vec_id AS xid, y.vec_id AS yid,
             CAST(ROUND(CASE WHEN x.nrm * y.nrm = 0 THEN 0.0
               ELSE list_sum(list_transform(range(1, len(x.embedding)+1), k ->
                      CAST(x.embedding[k] AS DOUBLE) * CAST(y.embedding[k] AS DOUBLE)))
                    / (x.nrm * y.nrm) END * 1000000) AS BIGINT) AS c6
           FROM ok x JOIN ok y ON x.bucket = y.bucket
           WHERE x.is_src AND NOT y.is_src),
         tx AS (
           SELECT xid, SUM(c6) AS sx, COUNT(*) AS nx FROM (
             SELECT xid, c6,
               ROW_NUMBER() OVER (PARTITION BY xid
                 ORDER BY c6 DESC, yid ASC) AS rn
             FROM sc) WHERE rn <= 4 GROUP BY xid),
         ty AS (
           SELECT yid, SUM(c6) AS sy, COUNT(*) AS ny FROM (
             SELECT yid, c6,
               ROW_NUMBER() OVER (PARTITION BY yid
                 ORDER BY c6 DESC, xid ASC) AS rn
             FROM sc) WHERE rn <= 4 GROUP BY yid),
         mg AS (
           SELECT s.xid, s.yid, s.c6,
             t1.sx * t2.ny + t2.sy * t1.nx AS den,
             ROUND(CAST(2 * s.c6 * t1.nx * t2.ny AS DOUBLE)
               / CAST(t1.sx * t2.ny + t2.sy * t1.nx AS DOUBLE), 6) AS margin
           FROM sc s JOIN tx t1 USING (xid) JOIN ty t2 USING (yid))
         SELECT xid AS src_id, yid AS tgt_id,
           CAST(c6 AS DOUBLE) / 1000000.0 AS cos, margin
         FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY xid
             ORDER BY margin DESC, c6 DESC, yid ASC) AS rn
           FROM mg WHERE den > 0 AND margin >= 1.02)
         WHERE rn = 1""",
    // q155: kNN label propagation — the derived-⌈√N⌉ assignment chain
    // (shared CTEs), seed×target candidates within a cluster, 5-NN cut
    // on (c6 desc, seed id asc), majority vote with the best-cosine
    // then smaller-label tie-break — all integer, hash-exact
    "q155_knn_labels" -> (ivfAsgCtesWith(AutoCentCte) + """,
         okq AS (
           SELECT * FROM asg
           QUALIFY COUNT(*) OVER (PARTITION BY bucket) <= 10000),
         sd AS (
           SELECT o.vec_id AS sid, o.embedding AS sv, o.nrm AS sn,
             o.bucket, e.label AS slabel
           FROM okq o JOIN embeddings e ON e.vec_id = o.vec_id
           WHERE o.vec_id % 3 = 0),
         tg AS (
           SELECT vec_id, embedding AS tv, nrm AS tn, bucket
           FROM okq WHERE vec_id % 3 <> 0),
         sc AS (
           SELECT t.vec_id, s.sid, s.slabel,
             CAST(ROUND(CASE WHEN t.tn * s.sn = 0 THEN 0.0
               ELSE list_sum(list_transform(range(1, len(t.tv)+1), k ->
                      CAST(t.tv[k] AS DOUBLE) * CAST(s.sv[k] AS DOUBLE)))
                    / (t.tn * s.sn) END * 1000000) AS BIGINT) AS c6
           FROM tg t JOIN sd s ON t.bucket = s.bucket),
         knn AS (
           SELECT vec_id, sid, slabel, c6 FROM (
             SELECT vec_id, sid, slabel, c6,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY c6 DESC, sid ASC) AS rn
             FROM sc) WHERE rn <= 5),
         vt AS (
           SELECT vec_id, slabel, COUNT(*) AS votes, MAX(c6) AS best
           FROM knn GROUP BY 1, 2),
         nn AS (SELECT vec_id, COUNT(*) AS n_neighbors FROM knn GROUP BY 1)
         SELECT v.vec_id, v.slabel AS pred_label, v.votes, nn.n_neighbors
         FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
             ORDER BY votes DESC, best DESC, slabel ASC) AS rk
           FROM vt) v
         JOIN nn USING (vec_id) WHERE v.rk = 1"""),
    // q156: the mining-recall audit — q155's cluster-bounded 5-NN per
    // target replayed (shared CTEs), compared against the exact cosine
    // top-5 over ALL seeds for the 256 smallest-md5-hash audited
    // targets (the q152 budget idiom); per-target hit count and recall
    "q156_knn_recall" -> (ivfAsgCtesWith(AutoCentCte) + """,
         okq AS (
           SELECT * FROM asg
           QUALIFY COUNT(*) OVER (PARTITION BY bucket) <= 10000),
         sd AS (
           SELECT vec_id AS sid, embedding AS sv, nrm AS sn, bucket
           FROM okq WHERE vec_id % 3 = 0),
         tg AS (
           SELECT vec_id, embedding AS tv, nrm AS tn, bucket
           FROM okq WHERE vec_id % 3 <> 0),
         sc AS (
           SELECT t.vec_id, s.sid,
             CAST(ROUND(CASE WHEN t.tn * s.sn = 0 THEN 0.0
               ELSE list_sum(list_transform(range(1, len(t.tv)+1), k ->
                      CAST(t.tv[k] AS DOUBLE) * CAST(s.sv[k] AS DOUBLE)))
                    / (t.tn * s.sn) END * 1000000) AS BIGINT) AS c6
           FROM tg t JOIN sd s ON t.bucket = s.bucket),
         knn AS (
           SELECT vec_id, sid FROM (
             SELECT vec_id, sid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY c6 DESC, sid ASC) AS rn
             FROM sc) WHERE rn <= 5),
         aud AS (
           SELECT vec_id, embedding AS qv, nrm AS qn FROM en
           WHERE vec_id % 3 <> 0
           QUALIFY ROW_NUMBER() OVER (ORDER BY
             ('0x' || substr(md5(vec_id::VARCHAR || ':knnrecall'), 1, 15))::BIGINT
               / 1152921504606846976.0 ASC, vec_id ASC) <= 256),
         sall AS (
           SELECT vec_id AS sid, embedding AS sv, nrm AS sn FROM en
           WHERE vec_id % 3 = 0),
         exact AS (
           SELECT vec_id, sid FROM (
             SELECT a.vec_id, s.sid,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
                 CAST(ROUND(CASE WHEN a.qn * s.sn = 0 THEN 0.0
                   ELSE list_sum(list_transform(range(1, len(a.qv)+1), k ->
                          CAST(a.qv[k] AS DOUBLE) * CAST(s.sv[k] AS DOUBLE)))
                        / (a.qn * s.sn) END * 1000000) AS BIGINT) DESC,
                 s.sid ASC) AS rn
             FROM aud a CROSS JOIN sall s) WHERE rn <= 5)
         SELECT e.vec_id, COUNT(k.sid) AS n_hits,
           ROUND(CAST(COUNT(k.sid) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS recall
         FROM exact e LEFT JOIN knn k
           ON e.vec_id = k.vec_id AND e.sid = k.sid
         GROUP BY 1"""),
    // q157: the q155 chain with targets probing their TOP-3 clusters —
    // 3 = nprobeFor(0.8, 2000), the grid-derived operating point —
    // (sim desc, ties to the larger cid — the kernel's multi-probe
    // order); seeds stay home-assigned, probe rows restricted to
    // cap-surviving buckets, decision path identical to q155
    "q157_knn_labels_multiprobe" -> (ivfAsgCtesWith(AutoCentCte) + """,
         okq AS (
           SELECT * FROM asg
           QUALIFY COUNT(*) OVER (PARTITION BY bucket) <= 10000),
         okb AS (SELECT DISTINCT bucket FROM okq),
         sd AS (
           SELECT o.vec_id AS sid, o.embedding AS sv, o.nrm AS sn,
             o.bucket, e.label AS slabel
           FROM okq o JOIN embeddings e ON e.vec_id = o.vec_id
           WHERE o.vec_id % 3 = 0),
         tp AS (
           SELECT vec_id, tv, tn, bucket FROM (
             SELECT e.vec_id, e.embedding AS tv, e.nrm AS tn,
               c.cid AS bucket,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 CASE WHEN e.nrm * c.nrm = 0 THEN 0.0
                      ELSE list_sum(list_transform(range(1, len(e.embedding)+1), k ->
                             CAST(e.embedding[k] AS DOUBLE) * CAST(c.embedding[k] AS DOUBLE)))
                           / (e.nrm * c.nrm) END DESC,
                 c.cid DESC) AS rn
             FROM en e CROSS JOIN cn c WHERE e.vec_id % 3 <> 0)
           WHERE rn <= 3),
         tg AS (
           SELECT t.vec_id, t.tv, t.tn, t.bucket
           FROM tp t JOIN okb USING (bucket)),
         sc AS (
           SELECT t.vec_id, s.sid, s.slabel,
             CAST(ROUND(CASE WHEN t.tn * s.sn = 0 THEN 0.0
               ELSE list_sum(list_transform(range(1, len(t.tv)+1), k ->
                      CAST(t.tv[k] AS DOUBLE) * CAST(s.sv[k] AS DOUBLE)))
                    / (t.tn * s.sn) END * 1000000) AS BIGINT) AS c6
           FROM tg t JOIN sd s ON t.bucket = s.bucket),
         knn AS (
           SELECT vec_id, sid, slabel, c6 FROM (
             SELECT vec_id, sid, slabel, c6,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY c6 DESC, sid ASC) AS rn
             FROM sc) WHERE rn <= 5),
         vt AS (
           SELECT vec_id, slabel, COUNT(*) AS votes, MAX(c6) AS best
           FROM knn GROUP BY 1, 2),
         nn AS (SELECT vec_id, COUNT(*) AS n_neighbors FROM knn GROUP BY 1)
         SELECT v.vec_id, v.slabel AS pred_label, v.votes, nn.n_neighbors
         FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
             ORDER BY votes DESC, best DESC, slabel ASC) AS rk
           FROM vt) v
         JOIN nn USING (vec_id) WHERE v.rk = 1"""),
    // q159: ingest-form labeling — quantizer and degenerate-cluster cap
    // from the SEED slice alone (the index population), targets assigned
    // against it statelessly; decision tail identical to q155
    "q159_knn_labels_ingest" ->
      """WITH sl AS (
           SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 = 0),
         cent AS (
           SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS cid,
             embedding
           FROM sl
           QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <=
             LEAST(65536, GREATEST(1,
               CAST(ceil(sqrt((SELECT COUNT(*) FROM sl))) AS BIGINT)))),
         cn AS (SELECT cid, embedding,
                 sqrt(list_sum(list_transform(range(1, len(embedding)+1), k ->
                   CAST(embedding[k] AS DOUBLE) * CAST(embedding[k] AS DOUBLE)))) AS nrm
                FROM cent),
         en AS (SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(range(1, len(embedding)+1), k ->
                   CAST(embedding[k] AS DOUBLE) * CAST(embedding[k] AS DOUBLE)))) AS nrm
                FROM embeddings),
         asg AS (
           SELECT e.vec_id, e.embedding, e.nrm,
             (SELECT c.cid FROM cn c
              ORDER BY CASE WHEN e.nrm * c.nrm = 0 THEN 0.0
                       ELSE list_sum(list_transform(range(1, len(e.embedding)+1), k ->
                              CAST(e.embedding[k] AS DOUBLE) * CAST(c.embedding[k] AS DOUBLE))) / (e.nrm * c.nrm) END DESC,
                       c.cid DESC
              LIMIT 1) AS bucket
           FROM en e),
         sd AS (
           SELECT a.vec_id AS sid, a.embedding AS sv, a.nrm AS sn,
             a.bucket, e.label AS slabel
           FROM asg a JOIN embeddings e ON e.vec_id = a.vec_id
           WHERE a.vec_id % 3 = 0
           QUALIFY COUNT(*) OVER (PARTITION BY a.bucket) <= 10000),
         tg AS (
           SELECT vec_id, embedding AS tv, nrm AS tn, bucket
           FROM asg WHERE vec_id % 3 <> 0),
         sc AS (
           SELECT t.vec_id, s.sid, s.slabel,
             CAST(ROUND(CASE WHEN t.tn * s.sn = 0 THEN 0.0
               ELSE list_sum(list_transform(range(1, len(t.tv)+1), k ->
                      CAST(t.tv[k] AS DOUBLE) * CAST(s.sv[k] AS DOUBLE)))
                    / (t.tn * s.sn) END * 1000000) AS BIGINT) AS c6
           FROM tg t JOIN sd s ON t.bucket = s.bucket),
         knn AS (
           SELECT vec_id, sid, slabel, c6 FROM (
             SELECT vec_id, sid, slabel, c6,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY c6 DESC, sid ASC) AS rn
             FROM sc) WHERE rn <= 5),
         vt AS (
           SELECT vec_id, slabel, COUNT(*) AS votes, MAX(c6) AS best
           FROM knn GROUP BY 1, 2),
         nn AS (SELECT vec_id, COUNT(*) AS n_neighbors FROM knn GROUP BY 1)
         SELECT v.vec_id, v.slabel AS pred_label, v.votes, nn.n_neighbors
         FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
             ORDER BY votes DESC, best DESC, slabel ASC) AS rk
           FROM vt) v
         JOIN nn USING (vec_id) WHERE v.rk = 1""",
    // q160: frozen-index margin mining — the full seed-side derivation
    // replayed end-to-end: seed-slice centroids (q159's idiom), home
    // assignment with ties to the larger cid, the seed-membership cap,
    // WITHIN-SEED top-4 hubness stats (the build-time artifact), then
    // the batch side probing its top-8 centroids (nprobeForMining(0.8)
    // at the audited 1× scale — the derived constant, r15) and the
    // q154 margin tail over integer-exact operands
    "q160_margin_mining_ingest" ->
      (MarginIndexCtes + """,
         tp AS (
           SELECT xid, xv, xn, bucket FROM (
             SELECT e.vec_id AS xid, e.embedding AS xv, e.nrm AS xn,
               c.cid AS bucket,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 CASE WHEN e.nrm * c.nrm = 0 THEN 0.0
                      ELSE list_sum(list_transform(range(1, len(e.embedding)+1), k ->
                             CAST(e.embedding[k] AS DOUBLE) * CAST(c.embedding[k] AS DOUBLE)))
                           / (e.nrm * c.nrm) END DESC,
                 c.cid DESC) AS rn
             FROM xb e CROSS JOIN cn c)
           WHERE rn <= 8),
         xs AS (
           SELECT t.xid, t.xv, t.xn, t.bucket
           FROM tp t JOIN okb USING (bucket)),
         sc AS (
           SELECT x.xid, s.yid,
             CAST(ROUND(CASE WHEN x.xn * s.yn = 0 THEN 0.0
               ELSE list_sum(list_transform(range(1, len(x.xv)+1), k ->
                      CAST(x.xv[k] AS DOUBLE) * CAST(s.yv[k] AS DOUBLE)))
                    / (x.xn * s.yn) END * 1000000) AS BIGINT) AS c6
           FROM xs x JOIN sd s ON x.bucket = s.bucket),
         tx AS (
           SELECT xid, SUM(c6) AS sx, COUNT(*) AS nx FROM (
             SELECT xid, c6,
               ROW_NUMBER() OVER (PARTITION BY xid
                 ORDER BY c6 DESC, yid ASC) AS rn
             FROM sc) WHERE rn <= 4 GROUP BY xid),
         mg AS (
           SELECT s.xid, s.yid, s.c6,
             t1.sx * t2.ny + t2.sy * t1.nx AS den,
             ROUND(CAST(2 * s.c6 * t1.nx * t2.ny AS DOUBLE)
               / CAST(t1.sx * t2.ny + t2.sy * t1.nx AS DOUBLE), 6) AS margin
           FROM sc s JOIN tx t1 USING (xid) JOIN ws t2 USING (yid))
         SELECT xid AS src_id, yid AS tgt_id,
           CAST(c6 AS DOUBLE) / 1000000.0 AS cos, margin
         FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY xid
             ORDER BY margin DESC, c6 DESC, yid ASC) AS rn
           FROM mg WHERE den > 0 AND margin >= 1.02)
         WHERE rn = 1"""),
    // q164: the mining recall AUDIT end-to-end — the q160 frozen-index
    // prefix, the md5-hash audited-source cut (q152's idiom), then the
    // SAME margin decision chain twice: the bucketed arm over the top-8
    // probed clusters and the exact arm over audited × ALL index seeds
    "q164_mining_recall_audit" ->
      (MarginIndexCtes + """,
         aud AS (
           SELECT vec_id, embedding, nrm FROM xb
           QUALIFY ROW_NUMBER() OVER (ORDER BY
             ('0x' || substr(md5(vec_id::VARCHAR || ':minerecall'), 1, 15))::BIGINT
               / 1152921504606846976.0 ASC, vec_id ASC) <= 256),
         tp AS (
           SELECT xid, xv, xn, bucket FROM (
             SELECT e.vec_id AS xid, e.embedding AS xv, e.nrm AS xn,
               c.cid AS bucket,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 CASE WHEN e.nrm * c.nrm = 0 THEN 0.0
                      ELSE list_sum(list_transform(range(1, len(e.embedding)+1), k ->
                             CAST(e.embedding[k] AS DOUBLE) * CAST(c.embedding[k] AS DOUBLE)))
                           / (e.nrm * c.nrm) END DESC,
                 c.cid DESC) AS rn
             FROM aud e CROSS JOIN cn c)
           WHERE rn <= 8),
         xs AS (
           SELECT t.xid, t.xv, t.xn, t.bucket
           FROM tp t JOIN okb USING (bucket)),
         sc_b AS (
           SELECT x.xid, s.yid,
             CAST(ROUND(CASE WHEN x.xn * s.yn = 0 THEN 0.0
               ELSE list_sum(list_transform(range(1, len(x.xv)+1), k ->
                      CAST(x.xv[k] AS DOUBLE) * CAST(s.yv[k] AS DOUBLE)))
                    / (x.xn * s.yn) END * 1000000) AS BIGINT) AS c6
           FROM xs x JOIN sd s ON x.bucket = s.bucket),
         tx_b AS (
           SELECT xid, SUM(c6) AS sx, COUNT(*) AS nx FROM (
             SELECT xid, c6,
               ROW_NUMBER() OVER (PARTITION BY xid
                 ORDER BY c6 DESC, yid ASC) AS rn
             FROM sc_b) WHERE rn <= 4 GROUP BY xid),
         mg_b AS (
           SELECT s.xid, s.yid, s.c6,
             t1.sx * t2.ny + t2.sy * t1.nx AS den,
             ROUND(CAST(2 * s.c6 * t1.nx * t2.ny AS DOUBLE)
               / CAST(t1.sx * t2.ny + t2.sy * t1.nx AS DOUBLE), 6) AS margin
           FROM sc_b s JOIN tx_b t1 USING (xid) JOIN ws t2 USING (yid)),
         best_b AS (
           SELECT xid, yid FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY xid
               ORDER BY margin DESC, c6 DESC, yid ASC) AS rn
             FROM mg_b WHERE den > 0 AND margin >= 1.02)
           WHERE rn = 1),
         sc_e AS (
           SELECT x.vec_id AS xid, s.yid,
             CAST(ROUND(CASE WHEN x.nrm * s.yn = 0 THEN 0.0
               ELSE list_sum(list_transform(range(1, len(x.embedding)+1), k ->
                      CAST(x.embedding[k] AS DOUBLE) * CAST(s.yv[k] AS DOUBLE)))
                    / (x.nrm * s.yn) END * 1000000) AS BIGINT) AS c6
           FROM aud x CROSS JOIN sd s),
         tx_e AS (
           SELECT xid, SUM(c6) AS sx, COUNT(*) AS nx FROM (
             SELECT xid, c6,
               ROW_NUMBER() OVER (PARTITION BY xid
                 ORDER BY c6 DESC, yid ASC) AS rn
             FROM sc_e) WHERE rn <= 4 GROUP BY xid),
         mg_e AS (
           SELECT s.xid, s.yid, s.c6,
             t1.sx * t2.ny + t2.sy * t1.nx AS den,
             ROUND(CAST(2 * s.c6 * t1.nx * t2.ny AS DOUBLE)
               / CAST(t1.sx * t2.ny + t2.sy * t1.nx AS DOUBLE), 6) AS margin
           FROM sc_e s JOIN tx_e t1 USING (xid) JOIN ws t2 USING (yid)),
         best_e AS (
           SELECT xid, yid FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY xid
               ORDER BY margin DESC, c6 DESC, yid ASC) AS rn
             FROM mg_e WHERE den > 0 AND margin >= 1.02)
           WHERE rn = 1)
         SELECT a.vec_id, e.yid AS exact_tgt, b.yid AS approx_tgt,
           CAST(CASE WHEN e.yid IS NOT NULL AND b.yid = e.yid
                THEN 1 ELSE 0 END AS BIGINT) AS recovered,
           CAST(CASE WHEN b.yid IS NOT NULL
                      AND (e.yid IS NULL OR b.yid <> e.yid)
                THEN 1 ELSE 0 END AS BIGINT) AS spurious
         FROM aud a
         LEFT JOIN best_e e ON a.vec_id = e.xid
         LEFT JOIN best_b b ON a.vec_id = b.xid"""),
    // q158: the q132 search on the EXACT-LLOYD k-means quantizer — two
    // Lloyd rounds replayed in SQL via 6dp fixed-point integer sums
    // (order-independent, hash-exact), then the shared probe/annres tail
    "q158_ivf_kmeans_batch" ->
      (ivfBatchCtesOf(kmeansExactAsgCtes(2)) +
        " SELECT query_id, vec_id FROM annres"),
    // q153: the lossy JPEG round-trip — dims/bands are codec-contract
    // exact (closed-form in the id), and within_tol = TRUE is sound
    // because MultiModalSpec proves the JDK codec's solid-color error
    // ≤ 3 (< the 8.0 tolerance) over the fixture's full 8960-id period
    "q153_jpeg_reencode" ->
      """SELECT doc_id AS media_id,
           CAST(1 + doc_id % 7 AS INTEGER) AS width,
           CAST(1 + doc_id % 5 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS bands,
           TRUE AS within_tol
         FROM documents""",
    // q141: closed-form replay of the WAV round-trip — the fixture's
    // format/sample formulas re-derived per id, integer sum-of-squares
    // (exact in double on both engines), IEEE sqrt, 6dp round
    "q141_audio_decode" ->
      """WITH params AS (
           SELECT doc_id AS media_id,
             CAST(1 + doc_id % 2 AS INTEGER) AS channels,
             CAST(8000 * (1 + doc_id % 3) AS INTEGER) AS sample_rate,
             CAST(50 + doc_id % 101 AS BIGINT) AS frames
           FROM documents),
         chans AS (
           SELECT media_id, channels, sample_rate, frames,
             CAST(unnest(range(0, channels)) AS INTEGER) AS channel
           FROM params)
         SELECT media_id, channel, channels, sample_rate, frames,
           ROUND(sqrt(list_sum(list_transform(range(0, frames), k ->
             CAST(((media_id*31 + channel*17 + k*7) % 2001 - 1000)
               * ((media_id*31 + channel*17 + k*7) % 2001 - 1000) AS DOUBLE)))
             / frames), 6) AS rms
         FROM chans""",
    // q142: closed-form replay of the animated-GIF frame-sampling
    // round-trip — frame count, sampled indices (stride 2), dims, and
    // per-frame solid colors re-derived per (id, frame)
    "q142_video_frames" ->
      """WITH params AS (
           SELECT doc_id AS media_id,
             CAST(2 + doc_id % 4 AS INTEGER) AS frames,
             CAST(1 + doc_id % 7 AS INTEGER) AS width,
             CAST(1 + doc_id % 5 AS INTEGER) AS height
           FROM documents),
         fr AS (
           SELECT media_id, width, height,
             CAST((frames + 1) // 2 AS INTEGER) AS n_frames_sampled,
             CAST(unnest(range(0, frames, 2)) AS INTEGER) AS frame_idx
           FROM params)
         SELECT media_id, frame_idx, n_frames_sampled, width, height,
           CAST((media_id * 37 + frame_idx * 11) % 256 AS DOUBLE) AS mean_r,
           CAST((media_id * 59 + frame_idx * 23) % 256 AS DOUBLE) AS mean_g,
           CAST((media_id * 83 + frame_idx * 31) % 256 AS DOUBLE) AS mean_b
         FROM fr""",
    // q144: full SQL replay of the portable md5-HLL — register build,
    // integer-exact register fold, harmonic estimate, linear-counting
    // branch — the sketch itself is the oracle-checked artifact
    "q144_hll_distinct" ->
      """WITH sk AS (
           SELECT vc, event_type, est FROM (
             SELECT vc, event_type,
               ROUND(CASE WHEN raw <= 640.0 AND zero > 0
                     THEN 256.0 * ln(256.0 / zero) ELSE raw END, 6) AS est
             FROM (
               SELECT vc, event_type,
                 ((0.7213/(1+1.079/256))*256*256*9007199254740992.0)
                   / CAST(CAST(S AS BIGINT)
                       + (256 - nb) * 9007199254740992 AS DOUBLE) AS raw,
                 256 - nb AS zero
               FROM (
                 SELECT vc, event_type,
                   SUM(1::BIGINT << (53 - M)) AS S, COUNT(*) AS nb
                 FROM (
                   SELECT vc, event_type, bucket, MAX(rho) AS M
                   FROM (
                     SELECT vc, event_type, h % 256 AS bucket,
                       CASE WHEN h // 256 = 0 THEN 53
                            ELSE 53 - length(bin(h // 256)) END AS rho
                     FROM (
                       SELECT 'u' AS vc, event_type,
                         ('0x'||substr(md5(user_id::VARCHAR),1,15))::BIGINT AS h
                       FROM events WHERE user_id IS NOT NULL
                       UNION ALL
                       SELECT 'e' AS vc, event_type,
                         ('0x'||substr(md5(event_id::VARCHAR),1,15))::BIGINT AS h
                       FROM events WHERE event_id IS NOT NULL))
                   GROUP BY vc, event_type, bucket)
                 GROUP BY vc, event_type)))),
         ex AS (
           SELECT event_type,
             COUNT(DISTINCT user_id) AS exact_users,
             COUNT(DISTINCT event_id) AS exact_events
           FROM events GROUP BY event_type)
         SELECT ex.event_type, exact_users,
           u.est AS est_users, exact_events, e.est AS est_events
         FROM ex
         JOIN sk u ON u.event_type = ex.event_type AND u.vc = 'u'
         JOIN sk e ON e.event_type = ex.event_type AND e.vc = 'e'""",
    // q145: full SQL replay of the portable count-min sketch — cell
    // build, probe join, min-over-rows estimate; all integers, no
    // float caveat anywhere
    "q145_cms_heavy_hitters" ->
      """WITH ex AS (
           SELECT user_id, COUNT(*) AS exact_cnt FROM events
           WHERE user_id IS NOT NULL GROUP BY user_id),
         top AS (
           SELECT user_id, exact_cnt FROM ex
           ORDER BY exact_cnt DESC, user_id ASC LIMIT 20),
         cells AS (
           SELECT r.r AS row,
             (('0x'||substr(md5(r.r::VARCHAR || ':' || e.user_id::VARCHAR),1,15))::BIGINT) % 512 AS bucket,
             COUNT(*) AS cnt
           FROM events e CROSS JOIN range(0, 4) r(r)
           WHERE e.user_id IS NOT NULL
           GROUP BY 1, 2),
         est AS (
           SELECT t.user_id, MIN(COALESCE(c.cnt, 0)) AS cms_cnt
           FROM top t CROSS JOIN range(0, 4) r(r)
           LEFT JOIN cells c ON c.row = r.r AND c.bucket =
             (('0x'||substr(md5(r.r::VARCHAR || ':' || t.user_id::VARCHAR),1,15))::BIGINT) % 512
           GROUP BY t.user_id)
         SELECT t.user_id, t.exact_cnt, est.cms_cnt
         FROM top t JOIN est USING (user_id)""",
    // q146: full SQL replay of the log2-histogram quantile sketch —
    // bit-length bucketing, midpoint estimate, integer nearest-rank
    // pick; all integer arithmetic, no float caveat anywhere
    "q146_hist_quantiles" ->
      """WITH t AS (
           SELECT lang,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS BIGINT) AS v
           FROM documents),
         h AS (
           SELECT lang, s, v >> s AS top, COUNT(*) AS cnt FROM (
             SELECT lang, v, GREATEST(length(bin(v)) - 7, 0) AS s FROM t)
           GROUP BY 1, 2, 3),
         c AS (
           SELECT lang,
             (top << s) + CASE WHEN s = 0 THEN 0
               ELSE (1::BIGINT << (s - 1)) - 1 END AS est,
             SUM(cnt) OVER (PARTITION BY lang ORDER BY (top << s)) AS cum,
             SUM(cnt) OVER (PARTITION BY lang) AS n
           FROM h),
         spec(qname, num, den) AS (
           VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100)),
         pk AS (
           SELECT lang, qname, MIN(est) AS est_v
           FROM c CROSS JOIN spec
           WHERE cum >= (n * num + den - 1) // den
           GROUP BY 1, 2),
         ec AS (
           SELECT lang, v,
             SUM(cnt) OVER (PARTITION BY lang ORDER BY v) AS cum,
             SUM(cnt) OVER (PARTITION BY lang) AS n
           FROM (SELECT lang, v, COUNT(*) AS cnt FROM t GROUP BY 1, 2)),
         ek AS (
           SELECT lang, qname, MIN(v) AS ex_v
           FROM ec CROSS JOIN spec
           WHERE cum >= (n * num + den - 1) // den
           GROUP BY 1, 2),
         nd AS (SELECT lang, COUNT(*) AS n_docs FROM t GROUP BY 1)
         SELECT nd.lang, n_docs,
           MAX(CASE WHEN p.qname = 'p50' THEN ex_v END) AS exact_p50,
           MAX(CASE WHEN p.qname = 'p50' THEN est_v END) AS est_p50,
           MAX(CASE WHEN p.qname = 'p90' THEN ex_v END) AS exact_p90,
           MAX(CASE WHEN p.qname = 'p90' THEN est_v END) AS est_p90,
           MAX(CASE WHEN p.qname = 'p99' THEN ex_v END) AS exact_p99,
           MAX(CASE WHEN p.qname = 'p99' THEN est_v END) AS est_p99
         FROM nd
         JOIN pk p USING (lang)
         JOIN ek e ON e.lang = p.lang AND e.qname = p.qname
         GROUP BY 1, 2""",
    // q147: full SQL replay of HLL set algebra — per-source registers,
    // pair-wise max-merge, inclusion–exclusion; the estimate formula is
    // the same integer-exact fold as q144's
    "q147_hll_overlap" ->
      """WITH st AS (
           SELECT DISTINCT source,
             unnest(list_filter(string_split(lower(text), ' '),
               x -> x <> '')) AS term
           FROM documents),
         reg AS (
           SELECT source, h % 256 AS bucket,
             CASE WHEN h // 256 = 0 THEN 53
                  ELSE 53 - length(bin(h // 256)) END AS rho
           FROM (SELECT source,
                   ('0x'||substr(md5(term),1,15))::BIGINT AS h FROM st)),
         regs AS (
           SELECT source, bucket, MAX(rho) AS M FROM reg GROUP BY 1, 2),
         sest AS (
           SELECT source,
             ROUND(CASE WHEN raw <= 640.0 AND zero > 0
                   THEN 256.0 * ln(256.0 / zero) ELSE raw END, 6) AS est
           FROM (
             SELECT source,
               ((0.7213/(1+1.079/256))*256*256*9007199254740992.0)
                 / CAST(CAST(S AS BIGINT)
                     + (256 - nb) * 9007199254740992 AS DOUBLE) AS raw,
               256 - nb AS zero
             FROM (
               SELECT source, SUM(1::BIGINT << (53 - M)) AS S,
                 COUNT(*) AS nb
               FROM regs GROUP BY source))),
         px AS (
           SELECT x.source AS source_a, y.source AS source_b,
             COUNT(*) AS exact_intersect
           FROM st x JOIN st y
             ON x.term = y.term AND x.source < y.source
           GROUP BY 1, 2),
         pregs AS (
           SELECT source_a, source_b, bucket, MAX(M) AS M FROM (
             SELECT p.source_a, p.source_b, r.bucket, r.M
             FROM px p JOIN regs r ON r.source = p.source_a
             UNION ALL
             SELECT p.source_a, p.source_b, r.bucket, r.M
             FROM px p JOIN regs r ON r.source = p.source_b)
           GROUP BY 1, 2, 3),
         pest AS (
           SELECT source_a, source_b,
             ROUND(CASE WHEN raw <= 640.0 AND zero > 0
                   THEN 256.0 * ln(256.0 / zero) ELSE raw END, 6) AS est
           FROM (
             SELECT source_a, source_b,
               ((0.7213/(1+1.079/256))*256*256*9007199254740992.0)
                 / CAST(CAST(S AS BIGINT)
                     + (256 - nb) * 9007199254740992 AS DOUBLE) AS raw,
               256 - nb AS zero
             FROM (
               SELECT source_a, source_b,
                 SUM(1::BIGINT << (53 - M)) AS S, COUNT(*) AS nb
               FROM pregs GROUP BY 1, 2))),
         exv AS (
           SELECT source, COUNT(*) AS exact_vocab FROM st GROUP BY 1)
         SELECT p.source_a, p.source_b,
           a.exact_vocab AS exact_a, b.exact_vocab AS exact_b,
           exact_intersect, sa.est AS est_a, sb.est AS est_b,
           pe.est AS est_union,
           ROUND(sa.est + sb.est - pe.est, 6) AS est_intersect
         FROM px p
         JOIN exv a ON a.source = p.source_a
         JOIN exv b ON b.source = p.source_b
         JOIN sest sa ON sa.source = p.source_a
         JOIN sest sb ON sb.source = p.source_b
         JOIN pest pe ON pe.source_a = p.source_a
           AND pe.source_b = p.source_b""",
    // q148: the q128 BM25 chain and the q25 cosine chain, each cut to a
    // top-10 pool, ranked on (rounded score desc, id asc), fused by RRF
    "q148_rrf_fusion" ->
      """WITH w AS (
           SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
           FROM documents),
         base AS (SELECT doc_id, len(toks) AS dl, toks FROM w),
         fp AS (
           SELECT doc_id, dl, term FROM (
             SELECT doc_id, dl, unnest(toks) AS term FROM base)
           WHERE term IN ('spark', 'stream', 'window')),
         tf AS (
           SELECT doc_id, term, COUNT(*) AS tf, MIN(dl) AS dl
           FROM fp GROUP BY 1, 2),
         stats AS (
           SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM base),
         dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         sc AS (
           SELECT t.doc_id,
             SUM(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * t.tf * 2.2
               / (t.tf + 1.2 * (0.25 + 0.75 * t.dl / s.avgdl))) AS bm25
           FROM tf t JOIN dft d USING (term) CROSS JOIN stats s
           GROUP BY t.doc_id),
         lexpool AS (
           SELECT doc_id, ROUND(bm25, 6) AS bm25
           FROM sc ORDER BY bm25 DESC, doc_id ASC LIMIT 10),
         lex AS (
           SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r_lex
           FROM lexpool),
         q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         simt AS (
           SELECT e.vec_id,
             list_sum(list_transform(range(1, len(e.embedding) + 1),
               k -> CAST(e.embedding[k] AS DOUBLE) * CAST(q.qe[k] AS DOUBLE))) /
             (NULLIF(sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                 k -> CAST(e.embedding[k] AS DOUBLE) * CAST(e.embedding[k] AS DOUBLE)))) *
               sqrt(list_sum(list_transform(range(1, len(q.qe) + 1),
                 k -> CAST(q.qe[k] AS DOUBLE) * CAST(q.qe[k] AS DOUBLE)))), 0)) AS sim
           FROM embeddings e, q),
         denpool AS (
           SELECT vec_id AS doc_id, ROUND(sim, 6) AS sim
           FROM simt ORDER BY sim DESC, vec_id ASC LIMIT 10),
         den AS (
           SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id ASC) AS r_dense
           FROM denpool)
         SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
           ROUND(COALESCE(1.0 / (60 + l.r_lex), 0)
               + COALESCE(1.0 / (60 + d.r_dense), 0), 6) AS rrf
         FROM lex l FULL OUTER JOIN den d ON l.doc_id = d.doc_id
         ORDER BY rrf DESC, doc_id ASC LIMIT 10""",
    // q149: the shared minhash pair chain feeds a symmetrized edge list;
    // three PageRank rounds unrolled as CTEs, intermediate ranks rounded
    // to 12 dp on both sides (see Graph.pageRankUndirected's contract)
    "q149_pagerank_centrality" -> (MinHashOracleCtes +
      """,
         e AS (SELECT id1 AS u, id2 AS v FROM pairs WHERE jaccard >= 0.5
               UNION SELECT id2, id1 FROM pairs WHERE jaccard >= 0.5),
         deg AS (SELECT u, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY u),
         nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
         r0 AS (SELECT u, ROUND(1.0 / n, 12) AS pr FROM deg, nn),
         r1 AS (
           SELECT u, ROUND(CAST(0.15 AS DOUBLE) / nn.n
               + CAST(0.85 AS DOUBLE) * m, 12) AS pr
           FROM (SELECT e.v AS u, SUM(r0.pr / deg.d) AS m
                 FROM e JOIN r0 ON r0.u = e.u JOIN deg ON deg.u = e.u
                 GROUP BY e.v) s, nn),
         r2 AS (
           SELECT u, ROUND(CAST(0.15 AS DOUBLE) / nn.n
               + CAST(0.85 AS DOUBLE) * m, 12) AS pr
           FROM (SELECT e.v AS u, SUM(r1.pr / deg.d) AS m
                 FROM e JOIN r1 ON r1.u = e.u JOIN deg ON deg.u = e.u
                 GROUP BY e.v) s, nn),
         r3 AS (
           SELECT u, ROUND(CAST(0.15 AS DOUBLE) / nn.n
               + CAST(0.85 AS DOUBLE) * m, 12) AS pr
           FROM (SELECT e.v AS u, SUM(r2.pr / deg.d) AS m
                 FROM e JOIN r2 ON r2.u = e.u JOIN deg ON deg.u = e.u
                 GROUP BY e.v) s, nn)
         SELECT u AS doc_id, ROUND(pr, 6) AS pagerank FROM r3"""),
    // q150: oriented edge-iterator triangle count (each a<b<c found once
    // as (a,b)+(b,c) closed by (a,c)); wedges = Σ d(d−1)/2 exact integer
    "q150_triangle_census" -> (MinHashOracleCtes +
      """,
         pe AS (SELECT DISTINCT id1 AS u, id2 AS v FROM pairs
                WHERE jaccard >= 0.5),
         nodes AS (
           SELECT COUNT(DISTINCT x) AS n_nodes FROM
             (SELECT u AS x FROM pe UNION SELECT v FROM pe)),
         ecnt AS (SELECT COUNT(*) AS n_edges FROM pe),
         wed AS (
           SELECT COALESCE(CAST(SUM(d * (d - 1) // 2) AS BIGINT), 0)
             AS n_wedges
           FROM (SELECT x, COUNT(*) AS d FROM
                   (SELECT u AS x FROM pe UNION ALL SELECT v FROM pe)
                 GROUP BY x)),
         tri AS (
           SELECT COUNT(*) AS n_triangles
           FROM pe e1
           JOIN pe e2 ON e2.u = e1.v
           JOIN pe e3 ON e3.u = e1.u AND e3.v = e2.v)
         SELECT n_nodes, n_edges, n_wedges, n_triangles,
           ROUND(CASE WHEN n_wedges = 0 THEN 0.0
                 ELSE 3.0 * n_triangles / n_wedges END, 6) AS transitivity
         FROM nodes, ecnt, wed, tri"""),
    // q151: common-neighbor (triangle-support) count per batch edge,
    // support counted over the full symmetric adjacency
    "q151_edge_support" -> (MinHashOracleCtes +
      """,
         pe AS (SELECT DISTINCT id1 AS u, id2 AS v FROM pairs
                WHERE jaccard >= 0.5),
         adj AS (SELECT u AS x, v AS y FROM pe
                 UNION ALL SELECT v, u FROM pe),
         b AS (SELECT u, v FROM pe WHERE u % 5 = 0 OR v % 5 = 0),
         cn AS (
           SELECT b.u, b.v, COUNT(*) AS n
           FROM b
           JOIN adj a1 ON a1.x = b.u
           JOIN adj a2 ON a2.x = b.v AND a2.y = a1.y
           GROUP BY b.u, b.v)
         SELECT b.u AS id1, b.v AS id2,
           COALESCE(cn.n, 0) AS n_common
         FROM b LEFT JOIN cn ON cn.u = b.u AND cn.v = b.v"""),
    // q143: closed-form replay of the resize round-trip — ceil(dims/2)
    // and the solid color preserved by any resampling of a solid image
    "q143_image_resize" ->
      """SELECT doc_id AS media_id,
           CAST((1 + doc_id % 7 + 1) // 2 AS INTEGER) AS width,
           CAST((1 + doc_id % 5 + 1) // 2 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS bands,
           CAST((doc_id * 37) % 256 AS DOUBLE) AS mean_r,
           CAST((doc_id * 59) % 256 AS DOUBLE) AS mean_g,
           CAST((doc_id * 83) % 256 AS DOUBLE) AS mean_b
         FROM documents""",
    "q105_pq_topk" -> PqTopKOracle,
    // q106 is the materialized-code-table path of the same PQ algorithm —
    // identical codebooks, encoding, ADC ranking, and tie-break.
    "q106_pq_indexed" -> PqTopKOracle,
    "q127_pq_rerank" -> (PqAdcCtes + """,
         short AS (
           SELECT vec_id FROM adc ORDER BY dist ASC, vec_id ASC LIMIT 100),
         qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         SELECT vec_id FROM (
           SELECT e.vec_id,
             list_sum(list_transform(range(1, len(e.embedding) + 1),
               k -> CAST(e.embedding[k] AS DOUBLE) * CAST(qv.qe[k] AS DOUBLE))) /
             (NULLIF(sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                 k -> CAST(e.embedding[k] AS DOUBLE) * CAST(e.embedding[k] AS DOUBLE)))) *
               sqrt(list_sum(list_transform(range(1, len(qv.qe) + 1),
                 k -> CAST(qv.qe[k] AS DOUBLE) * CAST(qv.qe[k] AS DOUBLE)))), 0)) AS sim
           FROM embeddings e JOIN short USING (vec_id) CROSS JOIN qv)
         ORDER BY sim DESC, vec_id ASC LIMIT 10"""),
    "q69_repetition_signals" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
           FROM documents),
         tf AS (
           SELECT doc_id, unnest(toks) AS term FROM t),
         uni AS (
           SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
                  MAX(tf) AS top_tf, COUNT(*) AS n_distinct
           FROM (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2)
           GROUP BY doc_id),
         bg AS (
           SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i + 1])) AS b
           FROM t),
         bi AS (
           SELECT doc_id, CAST(SUM(bf) AS BIGINT) AS n_bigrams, MAX(bf) AS top_bf
           FROM (SELECT doc_id, b, COUNT(*) AS bf FROM bg GROUP BY 1, 2)
           GROUP BY doc_id),
         s AS (
           SELECT uni.doc_id, n_tokens, CAST(n_distinct AS BIGINT) AS n_distinct,
             ROUND(CAST(top_tf AS DOUBLE) / n_tokens, 6) AS top_word_frac,
             ROUND(COALESCE(CAST(top_bf AS DOUBLE) / n_bigrams, 0.0), 6) AS top_bigram_frac,
             ROUND(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS distinct_ratio
           FROM uni LEFT JOIN bi ON uni.doc_id = bi.doc_id)
         SELECT *,
           (top_word_frac > 0.12 OR top_bigram_frac > 0.08) AS repetitive
         FROM s""",
    "q73_vocab_coverage" ->
      """WITH tf AS (
           SELECT unnest(list_filter(string_split(lower(text), ' '),
             x -> x <> '')) AS term
           FROM documents),
         c AS (SELECT term, COUNT(*) AS cnt FROM tf GROUP BY 1),
         t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c)
         SELECT term, cnt,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS BIGINT) AS rank,
           ROUND(CAST(SUM(cnt) OVER (ORDER BY cnt DESC, term ASC
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / CAST(t.total AS DOUBLE), 6) AS coverage
         FROM c, t""",
    "q72_rproj_topk" -> RprojOracle,
    "q76_rproj_indexed" -> RprojOracle,
    "q78_rproj_recall" -> (RprojCtes +
      """,
         approx AS (SELECT vec_id FROM sc ORDER BY sim DESC, vec_id ASC LIMIT 10),
         fx AS (
           SELECT e.vec_id,
             list_sum(list_transform(range(1, len(e.embedding) + 1),
               k -> CAST(e.embedding[k] AS DOUBLE) * CAST(q.qe[k] AS DOUBLE))) /
             (NULLIF(sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                 k -> CAST(e.embedding[k] AS DOUBLE) * CAST(e.embedding[k] AS DOUBLE)))) *
               sqrt(list_sum(list_transform(range(1, len(q.qe) + 1),
                 k -> CAST(q.qe[k] AS DOUBLE) * CAST(q.qe[k] AS DOUBLE)))), 0)) AS sim
           FROM embeddings e, q),
         exact AS (SELECT vec_id FROM fx ORDER BY sim DESC, vec_id ASC LIMIT 10)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_hits,
           ROUND(CAST(COUNT(*) AS DOUBLE) / 10.0, 6) AS recall
         FROM exact JOIN approx USING (vec_id)"""),
    "q71_mixture_resample" ->
      """WITH c AS (
           SELECT lang, CAST(COUNT(*) AS DOUBLE) AS cnt
           FROM documents GROUP BY 1),
         t AS (
           SELECT SUM(cnt) AS n_total, SUM(pow(cnt, 0.5)) AS w_total FROM c),
         r AS (
           SELECT lang,
             ROUND(LEAST(1.0,
               0.5 * n_total * pow(cnt, 0.5) / (w_total * cnt)), 6) AS rate
           FROM c, t)
         SELECT d.doc_id, d.lang, r.rate
         FROM documents d JOIN r USING (lang)
         WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || ':mix'), 1, 15))::BIGINT
               / 1152921504606846976.0 < r.rate""",
    "q70_doc_chunks" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents),
         w AS (
           SELECT doc_id, toks,
             unnest(generate_series(0, GREATEST(len(toks) - 8, 1) - 1, 24)) AS start
           FROM t WHERE len(toks) > 0)
         SELECT doc_id,
           CAST(start // 24 AS BIGINT) AS chunk_idx,
           CAST(start AS BIGINT) AS start,
           CAST(len(list_slice(toks, start + 1, start + 32)) AS BIGINT) AS n_chunk_tokens,
           array_to_string(list_slice(toks, start + 1, start + 32), ' ') AS chunk_text
         FROM w""",
    // the PNG fixture is solid-color with id-derived dims/colors and PNG
    // is lossless, so every decoded feature is closed-form in the id;
    // the /255 normalization is one exact IEEE division on both engines
    "q34_media_features" ->
      """SELECT doc_id AS media_id,
           CAST(1 + doc_id % 7 AS INTEGER) AS width,
           CAST(1 + doc_id % 5 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS bands,
           ROUND(CAST((doc_id * 37) % 256 AS DOUBLE) / 255.0, 6) AS f_r,
           ROUND(CAST((doc_id * 59) % 256 AS DOUBLE) / 255.0, 6) AS f_g,
           ROUND(CAST((doc_id * 83) % 256 AS DOUBLE) / 255.0, 6) AS f_b
         FROM documents""",
    "q60_cc_dedup" -> (MinHashOracleCtes.replaceFirst("WITH ", "WITH RECURSIVE ").stripTrailing() +
      """,
         e AS (SELECT id1 AS u, id2 AS v FROM pairs WHERE jaccard >= 0.5
               UNION SELECT id2, id1 FROM pairs WHERE jaccard >= 0.5),
         reach(u, v) AS (
           SELECT u, v FROM e
           UNION
           SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u),
         comp AS (SELECT u AS node, LEAST(u, MIN(v)) AS component
                  FROM reach GROUP BY u)
         SELECT doc_id FROM documents
         WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)"""),
    "q121_leakage_split" -> (MinHashOracleCtes.replaceFirst("WITH ", "WITH RECURSIVE ").stripTrailing() +
      """,
         e AS (SELECT id1 AS u, id2 AS v FROM pairs WHERE jaccard >= 0.5
               UNION SELECT id2, id1 FROM pairs WHERE jaccard >= 0.5),
         reach(u, v) AS (
           SELECT u, v FROM e
           UNION
           SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u),
         comp AS (SELECT u AS node, LEAST(u, MIN(v)) AS component
                  FROM reach GROUP BY u),
         r AS (SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS split_group
               FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
         h AS (SELECT doc_id, split_group,
           ('0x' || substr(md5(split_group::VARCHAR || ':split'), 1, 15))::BIGINT
             / 1152921504606846976.0 AS u
           FROM r)
         SELECT doc_id, split_group,
           CASE WHEN u < 0.8 THEN 'train'
                WHEN u < 0.9 THEN 'valid' ELSE 'test' END AS split
         FROM h"""),
    "q122_dsir_sample" -> (DsirScoreCtes + """,
         sel AS (
           SELECT doc_id, logw,
             logw - ln(-ln(
               (('0x' || substr(md5(doc_id::VARCHAR || ':dsir'), 1, 15))::BIGINT)
                 / 1152921504606846976.0)) AS gkey
           FROM score)
         SELECT doc_id, ROUND(logw, 6) AS dsir_logw
         FROM sel ORDER BY gkey DESC, doc_id LIMIT 100"""),
    "q129_dsir_ess" -> (DsirScoreCtes + """,
         mx AS (SELECT MAX(logw) AS mx FROM score),
         w AS (SELECT exp(logw - mx) AS w FROM score, mx),
         s AS (SELECT COUNT(*) AS n_docs, SUM(w) AS s1, SUM(w * w) AS s2
               FROM w)
         SELECT n_docs, ROUND(s1 * s1 / s2, 6) AS ess,
           ROUND(s1 * s1 / (s2 * n_docs), 6) AS ess_frac,
           ROUND(1.0 / s1, 6) AS max_weight_share
         FROM s"""),
    "q130_stratified_holdout" ->
      """WITH h AS (
           SELECT doc_id, lang,
             ('0x' || substr(md5(doc_id::VARCHAR || ':hold'), 1, 15))::BIGINT
               / 1152921504606846976.0 AS u
           FROM documents)
         SELECT doc_id, lang FROM h
         QUALIFY ROW_NUMBER() OVER (PARTITION BY lang ORDER BY u, doc_id) <= 10""",
    "q131_threshold_curve" -> (MinHashOracleCtes +
      """SELECT tt.t AS threshold, COUNT(p.id2) AS n_pairs,
           COUNT(DISTINCT p.id2) AS n_docs_dropped
         FROM (SELECT unnest(CAST([0.5, 0.6, 0.7, 0.8, 0.9]
           AS DOUBLE[])) AS t) tt
         LEFT JOIN (SELECT ROUND(jaccard, 6) AS j, id2 FROM pairs
               WHERE jaccard >= 0.5) p ON p.j >= tt.t
         GROUP BY 1"""),
    "q123_fertility_audit" -> bpeFertilityOracle(12),
    "q128_bm25_topk" ->
      """WITH w AS (
           SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
           FROM documents),
         base AS (SELECT doc_id, len(toks) AS dl, toks FROM w),
         fp AS (
           SELECT doc_id, dl, term FROM (
             SELECT doc_id, dl, unnest(toks) AS term FROM base)
           WHERE term IN ('spark', 'stream', 'window')),
         tf AS (
           SELECT doc_id, term, COUNT(*) AS tf, MIN(dl) AS dl
           FROM fp GROUP BY 1, 2),
         stats AS (
           SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM base),
         dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         sc AS (
           SELECT t.doc_id,
             SUM(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * t.tf * 2.2
               / (t.tf + 1.2 * (0.25 + 0.75 * t.dl / s.avgdl))) AS bm25
           FROM tf t JOIN dft d USING (term) CROSS JOIN stats s
           GROUP BY t.doc_id)
         SELECT doc_id, ROUND(bm25, 6) AS bm25
         FROM sc ORDER BY bm25 DESC, doc_id ASC LIMIT 10""",
    "q126_repetition_scrub" ->
      """WITH w AS (
           SELECT doc_id, text,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
           FROM documents),
         g AS (
           SELECT doc_id, CAST(i AS INTEGER) AS s,
             array_to_string(list_slice(ws, CAST(i AS INTEGER),
               CAST(i AS INTEGER) + 4), ' ') AS gram
           FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 3)) AS i
                 FROM w WHERE len(ws) >= 5)),
         d AS (
           SELECT doc_id, s FROM (
             SELECT doc_id, s,
               MIN(s) OVER (PARTITION BY doc_id, gram) AS m FROM g)
           WHERE s > m),
         cuts AS (
           SELECT doc_id,
             list_sort(list_distinct(flatten(list(rng)))) AS cut_idx
           FROM (SELECT doc_id, range(s, s + 5) AS rng FROM d)
           GROUP BY doc_id)
         SELECT w.doc_id,
           CASE WHEN c.cut_idx IS NULL THEN w.text
             ELSE array_to_string(list_filter(w.ws,
               (x, i) -> NOT list_contains(c.cut_idx, i)), ' ')
           END AS clean_text,
           CAST(COALESCE(len(c.cut_idx), 0) AS BIGINT) AS n_cut_words
         FROM w LEFT JOIN cuts c USING (doc_id)""",
    "q124_crossdup_matrix" -> (MinHashOracleCtes +
      """SELECT LEAST(d1.source, d2.source) AS src_a,
           GREATEST(d1.source, d2.source) AS src_b,
           COUNT(*) AS n_pairs,
           ROUND(AVG(ROUND(jaccard, 6)), 6) AS avg_jaccard
         FROM pairs p
         JOIN documents d1 ON p.id1 = d1.doc_id
         JOIN documents d2 ON p.id2 = d2.doc_id
         WHERE jaccard >= 0.5
         GROUP BY 1, 2"""),
    "q125_epoch_plan" ->
      """WITH s AS (
           SELECT source, CAST(SUM(len(list_filter(string_split(text, ' '),
             x -> x <> ''))) AS BIGINT) AS avail_tokens
           FROM documents GROUP BY source),
         t AS (SELECT CAST(SUM(avail_tokens) AS BIGINT) AS tot,
                      SUM(sqrt(CAST(avail_tokens AS DOUBLE))) AS wtot
               FROM s)
         SELECT source, avail_tokens,
           ROUND(sqrt(CAST(avail_tokens AS DOUBLE)) / wtot, 6) AS mix_weight,
           ROUND(2.0 * tot * sqrt(CAST(avail_tokens AS DOUBLE)) / wtot, 2)
             AS target_tokens,
           ROUND(2.0 * tot * sqrt(CAST(avail_tokens AS DOUBLE))
             / (wtot * CAST(avail_tokens AS DOUBLE)), 6) AS epochs,
           (2.0 * tot * sqrt(CAST(avail_tokens AS DOUBLE))
             / (wtot * CAST(avail_tokens AS DOUBLE)) > 4.0) AS over_repeat_cliff
         FROM s, t""",
    "q77_est_calibration" -> (MinHashOracleCtes +
      """
         SELECT p.id1, p.id2,
           ROUND(CAST(len(list_filter(range(1, 17), i -> g1.sig[i] = g2.sig[i])) AS DOUBLE) / 16.0, 6) AS est_jaccard,
           ROUND(p.jaccard, 6) AS jaccard
         FROM pairs p
         JOIN sig g1 ON p.id1 = g1.doc_id
         JOIN sig g2 ON p.id2 = g2.doc_id"""),
    // q60's recursive-CC chain + per-doc quality (q24's formula) + argmax
    // keep per component (quality desc, id asc)
    "q74_cc_best_keep" -> (MinHashOracleCtes.replaceFirst("WITH ", "WITH RECURSIVE ").stripTrailing() +
      """,
         e AS (SELECT id1 AS u, id2 AS v FROM pairs WHERE jaccard >= 0.5
               UNION SELECT id2, id1 FROM pairs WHERE jaccard >= 0.5),
         reach(u, v) AS (
           SELECT u, v FROM e
           UNION
           SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u),
         comp AS (SELECT u AS node, LEAST(u, MIN(v)) AS component
                  FROM reach GROUP BY u),
         qs AS (
           SELECT t.doc_id,
             ROUND(LEAST(len(t.toks) / 20.0, 1.0) * 0.5 +
               (1.0 - LEAST((CASE WHEN length(d.text) = 0 THEN 0.0
                 ELSE (length(d.text) - length(regexp_replace(d.text, '[[:punct:]]', '', 'g'))) / length(d.text)
                 END) * 4.0, 1.0)) * 0.25 +
               LEAST((CASE WHEN len(t.toks) = 0 THEN 0.0
                 ELSE len(list_filter(t.toks, x -> list_contains(
                        ['the','a','an','and','or','of','to','in','is','it',
                         'for','on','with','as','at','by','from','that','this'], x))) / len(t.toks)
                 END) * 5.0, 1.0) * 0.25, 6) AS quality
           FROM tok t JOIN documents d USING (doc_id)),
         losers AS (
           SELECT node FROM (
             SELECT c.node, ROW_NUMBER() OVER (PARTITION BY c.component
               ORDER BY q.quality DESC, c.node ASC) AS rn
             FROM comp c JOIN qs q ON c.node = q.doc_id)
           WHERE rn > 1)
         SELECT doc_id FROM documents
         WHERE doc_id NOT IN (SELECT node FROM losers)"""),
    // curation prefix CTEs + the near-dup chain retargeted from `documents`
    // to the gated-and-exact-deduped `exact` subset + keep-first drop
    "q62_corpus_curation" -> ("WITH " + CurationCtes + ",\n       " +
      MinHashOracleCtes.replaceFirst("WITH ", "")
        .replace("FROM documents),", "FROM exact),").stripTrailing() +
      """,
         losers AS (SELECT DISTINCT id2 FROM pairs WHERE jaccard >= 0.5)
         SELECT e.doc_id, e.lang_pred, e.quality,
           CAST(len(list_filter(string_split(e.text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
         FROM exact e WHERE e.doc_id NOT IN (SELECT id2 FROM losers)"""),
    "q64_contamination" -> (ContaminationCtes +
      """
         SELECT c.corpus_id, p.probe_id, COUNT(*) AS shared
         FROM cf c JOIN pf p USING (shingle)
         WHERE c.corpus_id <> p.probe_id
         GROUP BY 1, 2 HAVING COUNT(*) >= 3"""),
    // bloom pre-filter changes the plan, never the answer: same oracle
    // as q64, replayed exactly
    "q86_bloom_contamination" -> (ContaminationCtes +
      """
         SELECT c.corpus_id, p.probe_id, COUNT(*) AS shared
         FROM cf c JOIN pf p USING (shingle)
         WHERE c.corpus_id <> p.probe_id
         GROUP BY 1, 2 HAVING COUNT(*) >= 3"""),
    "q75_contamination_report" -> (ContaminationCtes +
      """,
         cpairs AS (
           SELECT c.corpus_id, p.probe_id, COUNT(*) AS shared
           FROM cf c JOIN pf p USING (shingle)
           WHERE c.corpus_id <> p.probe_id
           GROUP BY 1, 2 HAVING COUNT(*) >= 3),
         agg AS (
           SELECT probe_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
                  MAX(shared) AS max_shared
           FROM cpairs GROUP BY 1)
         SELECT d.doc_id AS probe_id,
           COALESCE(a.n_hits, 0) AS n_hits,
           CAST(COALESCE(a.max_shared, 0) AS BIGINT) AS max_shared,
           COALESCE(a.n_hits, 0) > 0 AS contaminated
         FROM documents d LEFT JOIN agg a ON d.doc_id = a.probe_id
         WHERE d.doc_id % 50 = 0"""),
    "q65_stratified_sample" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS toks
           FROM documents),
         h AS (
           SELECT doc_id,
             len(list_filter(toks, x -> list_contains(['the','and','of','to','is'], x))) AS h_en,
             len(list_filter(toks, x -> list_contains(['der','die','und','das','ist'], x))) AS h_de,
             len(list_filter(toks, x -> list_contains(['le','la','et','les','est'], x))) AS h_fr,
             len(list_filter(toks, x -> list_contains(['el','los','las','una','es'], x))) AS h_es,
             len(list_filter(toks, x -> list_contains(['de5','shi4','le5','zai4','he2'], x))) AS h_zh
           FROM t),
         lg AS (
           SELECT doc_id,
             CASE WHEN GREATEST(h_en, h_de, h_fr, h_es, h_zh) = 0 THEN 'und'
                  WHEN h_en = GREATEST(h_en, h_de, h_fr, h_es, h_zh) THEN 'en'
                  WHEN h_de = GREATEST(h_en, h_de, h_fr, h_es, h_zh) THEN 'de'
                  WHEN h_fr = GREATEST(h_en, h_de, h_fr, h_es, h_zh) THEN 'fr'
                  WHEN h_es = GREATEST(h_en, h_de, h_fr, h_es, h_zh) THEN 'es'
                  ELSE 'zh' END AS lang_pred
           FROM h)
         SELECT doc_id, lang_pred FROM lg
         WHERE ('0x' || substr(md5(doc_id::VARCHAR || ':strat'), 1, 15))::BIGINT
               / 1152921504606846976.0 <
           CASE lang_pred WHEN 'en' THEN 0.5 WHEN 'fr' THEN 0.25 ELSE 0.8 END""",
    "q66_tfidf_terms" ->
      """WITH tok AS (
           SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT COUNT(*) AS n_docs FROM documents)
         SELECT doc_id, term, tf, df,
           ROUND(CAST(tf AS DOUBLE) * CAST(n_docs + 1 AS DOUBLE)
                 / CAST(df + 1 AS DOUBLE), 6) AS score
         FROM tf JOIN dfq USING (term), n
         QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
           ORDER BY score DESC, term ASC) <= 3""",
    "q67_pack_chunks" ->
      """WITH t AS (
           SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (
           SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
           FROM t)
         SELECT doc_id, n_tokens, "offset",
           "offset" // 2048 AS first_chunk,
           ("offset" + GREATEST(n_tokens, 1) - 1) // 2048 AS last_chunk
         FROM c""",
    // curation feature CTEs (ct/feats) + per-source rollup with the
    // DECIMAL-exact quality average
    "q84_ngram_jaccard" ->
      """WITH tok AS (
           SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_distinct(list_transform(range(1, len(toks) - 1), i ->
                         array_to_string(list_slice(toks, i, i + 2), ' ')))
             END AS sh
           FROM tok),
         ex AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
         posts AS (
           -- mirror Spark's dfCap=100 posting-list guard
           SELECT doc_id, shingle FROM ex
           QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 100),
         cand AS (
           SELECT l.doc_id AS id1, r.doc_id AS id2, COUNT(*) AS shared
           FROM posts l JOIN posts r ON l.shingle = r.shingle
           WHERE l.doc_id < r.doc_id
           GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         pairs AS (
           SELECT c.id1, c.id2, c.shared,
             CAST(len(list_distinct(list_intersect(s1.sh, s2.sh))) AS DOUBLE) /
             CAST(len(list_distinct(list_concat(s1.sh, s2.sh))) AS DOUBLE) AS jaccard
           FROM cand c JOIN sh s1 ON c.id1 = s1.doc_id JOIN sh s2 ON c.id2 = s2.doc_id)
         SELECT id1, id2, CAST(shared AS BIGINT) AS shared,
           ROUND(jaccard, 6) AS jaccard
         FROM pairs WHERE jaccard >= 0.5""",
    // q84's posting chain with the containment metric (min-normalized)
    "q92_containment_pairs" ->
      """WITH tok AS (
           SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_distinct(list_transform(range(1, len(toks) - 1), i ->
                         array_to_string(list_slice(toks, i, i + 2), ' ')))
             END AS sh
           FROM tok),
         ex AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
         posts AS (
           -- mirror Spark's dfCap=100 posting-list guard
           SELECT doc_id, shingle FROM ex
           QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 100),
         cand AS (
           SELECT l.doc_id AS id1, r.doc_id AS id2, COUNT(*) AS shared
           FROM posts l JOIN posts r ON l.shingle = r.shingle
           WHERE l.doc_id < r.doc_id
           GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         pairs AS (
           SELECT c.id1, c.id2, c.shared,
             CAST(len(list_distinct(list_intersect(s1.sh, s2.sh))) AS DOUBLE) /
             LEAST(len(s1.sh), len(s2.sh)) AS containment
           FROM cand c JOIN sh s1 ON c.id1 = s1.doc_id JOIN sh s2 ON c.id2 = s2.doc_id)
         SELECT id1, id2, CAST(shared AS BIGINT) AS shared,
           ROUND(containment, 6) AS containment
         FROM pairs WHERE containment >= 0.6""",
    // the GIF fixture's frame count/dims/per-frame colors are closed-form
    // in (id, frame) and solid frames palettize losslessly, so the
    // evenly-spaced sample (integer-division indices, first/last
    // inclusive, duplicates collapsed) replays exactly
    "q93_media_frames" ->
      """WITH params AS (
           SELECT doc_id AS media_id,
             CAST(2 + doc_id % 4 AS INTEGER) AS n_frames,
             CAST(1 + doc_id % 7 AS INTEGER) AS width,
             CAST(1 + doc_id % 5 AS INTEGER) AS height
           FROM documents),
         idx AS (
           SELECT DISTINCT media_id, n_frames, width, height,
             CAST((i * (n_frames - 1)) // 3 AS INTEGER) AS frame_idx
           FROM params, range(0, 4) t(i))
         SELECT media_id, n_frames, frame_idx, width, height,
           CAST((media_id * 37 + frame_idx * 11) % 256 AS DOUBLE) AS mean_r,
           CAST((media_id * 59 + frame_idx * 23) % 256 AS DOUBLE) AS mean_g,
           CAST((media_id * 83 + frame_idx * 31) % 256 AS DOUBLE) AS mean_b
         FROM idx""",
    // deletion-neighborhood blocking replayed, exact levenshtein verify;
    // both engines use unit-cost Wagner-Fischer distance
    "q94_fuzzy_join" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer),
         keys AS (
           SELECT c_custkey, c_name, unnest(list_distinct(list_append(
             list_transform(range(1, length(c_name)+1), i ->
               substr(c_name, 1, i-1) || substr(c_name, i+1)), c_name))) AS k
           FROM c),
         capped AS (
           SELECT * FROM keys
           -- mirror Spark's maxKeyBucket=1000 hot-key guard
           QUALIFY COUNT(*) OVER (PARTITION BY k) <= 1000),
         cand AS (
           SELECT DISTINCT l.c_custkey AS id1, l.c_name AS n1,
                  r.c_custkey AS id2, r.c_name AS n2
           FROM capped l JOIN capped r ON l.k = r.k
           WHERE l.c_custkey < r.c_custkey)
         SELECT id1, id2, CAST(levenshtein(n1, n2) AS INTEGER) AS dist
         FROM cand WHERE levenshtein(n1, n2) <= 1""",
    "q95_source_overlap" -> (MinHashOracleCtes +
      """SELECT LEAST(da.source, db.source) AS source_a,
           GREATEST(da.source, db.source) AS source_b,
           COUNT(*) AS n_pairs
         FROM pairs p
         JOIN documents da ON p.id1 = da.doc_id
         JOIN documents db ON p.id2 = db.doc_id
         WHERE p.jaccard >= 0.5
         GROUP BY 1, 2"""),
    "q96_boilerplate_scrub" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
           FROM documents),
         nz AS (SELECT doc_id, t FROM toks WHERE len(t) > 0),
         segs AS (
           SELECT doc_id, i AS idx, array_to_string(t[(i*2+1):(i*2+2)], ' ') AS seg
           FROM nz, UNNEST(generate_series(0, CAST((len(t)+1)//2 AS BIGINT) - 1)) AS g(i)),
         dfreq AS (SELECT seg, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY 1),
         n AS (SELECT COUNT(*) AS n_docs FROM documents)
         SELECT s.doc_id,
                string_agg(s.seg, ' ' ORDER BY s.idx) AS clean_text,
                COUNT(*) AS n_kept
         FROM segs s JOIN dfreq USING (seg), n
         WHERE CAST(dfreq.df AS DOUBLE) <= CAST(0.05 AS DOUBLE) * CAST(n.n_docs AS DOUBLE)
         GROUP BY s.doc_id""",
    "q97_event_transitions" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type, epoch_ns(ts) AS tns FROM events),
         t AS (
           SELECT event_type AS dst_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY tns, event_id) AS src_type
           FROM e)
         SELECT src_type, dst_type, COUNT(*) AS n_transitions
         FROM t WHERE src_type IS NOT NULL GROUP BY 1, 2""",
    // same CTE chain as q96; only the reassembly is restricted to the
    // batch (df stays corpus-wide — that is the point of the refresh path)
    "q98_incremental_scrub" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
           FROM documents),
         nz AS (SELECT doc_id, t FROM toks WHERE len(t) > 0),
         segs AS (
           SELECT doc_id, i AS idx, array_to_string(t[(i*2+1):(i*2+2)], ' ') AS seg
           FROM nz, UNNEST(generate_series(0, CAST((len(t)+1)//2 AS BIGINT) - 1)) AS g(i)),
         dfreq AS (SELECT seg, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY 1),
         n AS (SELECT COUNT(*) AS n_docs FROM documents)
         SELECT s.doc_id,
                string_agg(s.seg, ' ' ORDER BY s.idx) AS clean_text,
                COUNT(*) AS n_kept
         FROM segs s JOIN dfreq USING (seg), n
         WHERE s.doc_id % 10 = 0
           AND CAST(dfreq.df AS DOUBLE) <= CAST(0.05 AS DOUBLE) * CAST(n.n_docs AS DOUBLE)
         GROUP BY s.doc_id""",
    "q99_adaptive_gate" ->
      """WITH t AS (SELECT doc_id, source, text,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks,
             list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS ltoks
           FROM documents),
         s AS (SELECT doc_id, source,
             LEAST(len(toks) / 20.0, 1.0) AS len_score,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) / length(text)
             END AS punct_ratio,
             CASE WHEN len(ltoks) = 0 THEN 0.0
                  ELSE len(list_filter(ltoks, x -> list_contains(
                         ['the','a','an','and','or','of','to','in','is','it',
                          'for','on','with','as','at','by','from','that','this'], x))) / len(ltoks)
             END AS sw_ratio
           FROM t),
         q AS (SELECT doc_id, source,
             ROUND(len_score * 0.5 + (1.0 - LEAST(punct_ratio * 4.0, 1.0)) * 0.25
                   + LEAST(sw_ratio * 5.0, 1.0) * 0.25, 6) AS quality
           FROM s),
         r AS (SELECT doc_id, source, quality,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY quality DESC, doc_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
           FROM q)
         SELECT doc_id, source, quality FROM r
         WHERE CAST(rn AS DOUBLE) <= ceil(CAST(0.5 AS DOUBLE) * CAST(n AS DOUBLE))""",
    "q100_shuffled_export" ->
      """WITH d AS (
           SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
             md5('export:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
           FROM documents)
         SELECT doc_id, shuffle_key,
           CAST(ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) AS BIGINT) AS export_pos,
           CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY shuffle_key, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset",
           CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY shuffle_key, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) // 4096 AS shard
         FROM d""",
    "q101_zorder_key" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(list_sum(list_transform(range(0, 16), i ->
           ((l_partkey % 65536) // CAST(power(2, i) AS BIGINT) % 2)
             * CAST(power(2, 2*i) AS BIGINT) +
           ((l_suppkey % 65536) // CAST(power(2, i) AS BIGINT) % 2)
             * CAST(power(2, 2*i+1) AS BIGINT))) AS BIGINT) AS zkey
         FROM lineitem""",
    // null contract mirrored from Layout (spec-pinned): nulls sit OUTSIDE
    // rank space — per-dimension totals exclude them and a null-keyed row
    // is RETAINED with a null zq (LEFT JOIN + null-propagating CASE), the
    // exact behavior of the engine's left joins / null-propagating kernel
    "q102_zorder_quantile" ->
      """WITH hx AS (SELECT l_extendedprice AS v, COUNT(*) AS c
                FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
         qx AS (SELECT v, (COALESCE(SUM(c) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  * 64) // (SELECT SUM(c) FROM hx) AS b FROM hx),
         hy AS (SELECT l_partkey AS v, COUNT(*) AS c
                FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
         qy AS (SELECT v, (COALESCE(SUM(c) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  * 64) // (SELECT SUM(c) FROM hy) AS b FROM hy)
         SELECT l.l_orderkey, l.l_linenumber,
           CASE WHEN qx.b IS NULL OR qy.b IS NULL THEN NULL
           ELSE CAST(list_sum(list_transform(range(0, 6), i ->
             (qx.b // CAST(power(2, i) AS BIGINT) % 2)
               * CAST(power(2, 2*i) AS BIGINT) +
             (qy.b // CAST(power(2, i) AS BIGINT) % 2)
               * CAST(power(2, 2*i+1) AS BIGINT))) AS BIGINT) END AS zq
         FROM lineitem l
         LEFT JOIN qx ON l.l_extendedprice = qx.v
         LEFT JOIN qy ON l.l_partkey = qy.v""",
    // q161: q102's rank-quantile z-order with the x dimension a
    // composite surrogate key past 2^53 — the oracle ranks the wide
    // key in exact BIGINT arithmetic (DuckDB), so a double-precision
    // boundary probe engine-side would mis-bucket and hash-mismatch
    "q161_zorder_quantile_wide" ->
      """WITH base AS (
           SELECT l_orderkey, l_linenumber,
             (l_orderkey % 4194304) * 1099511627776 + l_partkey AS wkey,
             l_suppkey
           FROM lineitem),
         hx AS (SELECT wkey AS v, COUNT(*) AS c FROM base
                WHERE wkey IS NOT NULL GROUP BY 1),
         qx AS (SELECT v, (COALESCE(SUM(c) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  * 32) // (SELECT SUM(c) FROM hx) AS b FROM hx),
         hy AS (SELECT l_suppkey AS v, COUNT(*) AS c FROM base
                WHERE l_suppkey IS NOT NULL GROUP BY 1),
         qy AS (SELECT v, (COALESCE(SUM(c) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  * 32) // (SELECT SUM(c) FROM hy) AS b FROM hy)
         SELECT l.l_orderkey, l.l_linenumber,
           CASE WHEN qx.b IS NULL OR qy.b IS NULL THEN NULL
           ELSE CAST(list_sum(list_transform(range(0, 5), i ->
             (qx.b // CAST(power(2, i) AS BIGINT) % 2)
               * CAST(power(2, 2*i) AS BIGINT) +
             (qy.b // CAST(power(2, i) AS BIGINT) % 2)
               * CAST(power(2, 2*i+1) AS BIGINT))) AS BIGINT) END AS zq
         FROM base l
         LEFT JOIN qx ON l.wkey = qx.v
         LEFT JOIN qy ON l.l_suppkey = qy.v""",
    // q163: the time-typed layout key — DuckDB ranks the naive
    // timestamp directly; the engine's unix_micros long image is
    // strictly monotone in it, so the equi-depth buckets (and zq) match
    "q163_zorder_quantile_time" ->
      """WITH hx AS (SELECT l_shipdate AS v, COUNT(*) AS c FROM lineitem
                WHERE l_shipdate IS NOT NULL GROUP BY 1),
         qx AS (SELECT v, (COALESCE(SUM(c) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  * 32) // (SELECT SUM(c) FROM hx) AS b FROM hx),
         hy AS (SELECT l_extendedprice AS v, COUNT(*) AS c FROM lineitem
                WHERE l_extendedprice IS NOT NULL GROUP BY 1),
         qy AS (SELECT v, (COALESCE(SUM(c) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  * 32) // (SELECT SUM(c) FROM hy) AS b FROM hy)
         SELECT l.l_orderkey, l.l_linenumber,
           CASE WHEN qx.b IS NULL OR qy.b IS NULL THEN NULL
           ELSE CAST(list_sum(list_transform(range(0, 5), i ->
             (qx.b // CAST(power(2, i) AS BIGINT) % 2)
               * CAST(power(2, 2*i) AS BIGINT) +
             (qy.b // CAST(power(2, i) AS BIGINT) % 2)
               * CAST(power(2, 2*i+1) AS BIGINT))) AS BIGINT) END AS zq
         FROM lineitem l
         LEFT JOIN qx ON l.l_shipdate = qx.v
         LEFT JOIN qy ON l.l_extendedprice = qy.v""",
    "q103_substring_pairs" ->
      """WITH g AS (
           SELECT doc_id, unnest(list_distinct(list_filter(list_transform(
             range(1, greatest(length(text) - 99, 0) + 1),
             i -> ('0x' || substr(md5(substr(text, CAST(i AS INTEGER), 100)), 1, 15))::BIGINT),
             h -> h % 4 = 0))) AS gh
           FROM documents),
         d AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) <= 50)
         SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS shared
         FROM g a JOIN g b USING (gh) JOIN d USING (gh)
         WHERE a.doc_id < b.doc_id
         GROUP BY 1, 2
         HAVING COUNT(*) >= 2""",
    "q119_hilbert_key" -> hilbertOracle(16),
    "q120_length_batches" ->
      """WITH r AS (
           SELECT n_chars,
             row_number() OVER (ORDER BY n_chars, doc_id) AS rn
           FROM documents)
         SELECT (rn - 1) // 64 AS batch_id,
           COUNT(*) AS n_docs, MAX(n_chars) AS max_len,
           CAST(SUM(n_chars) AS BIGINT) AS sum_len,
           COUNT(*) * MAX(n_chars) - CAST(SUM(n_chars) AS BIGINT) AS pad_waste
         FROM r GROUP BY 1""",
    "q118_weighted_sample" ->
      """WITH t AS (
           SELECT lang, SUM(n_chars) AS wsum FROM documents GROUP BY lang)
         SELECT d.doc_id, d.lang, d.n_chars
         FROM documents d JOIN t USING (lang)
         WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || ':wsamp'), 1, 15))::BIGINT
               / 1152921504606846976.0 <
           50 * CAST(d.n_chars AS DOUBLE) / CAST(t.wsum AS DOUBLE)""",
    "q117_winnow_pairs" ->
      """WITH allg AS (
           SELECT doc_id, CAST(i AS INTEGER) AS pos,
             ('0x' || substr(md5(substr(text, CAST(i AS INTEGER), 40)), 1, 15))::BIGINT AS gh
           FROM (SELECT doc_id, text,
                 unnest(range(1, greatest(length(text) - 39, 0) + 1)) AS i
                 FROM documents)),
         nw AS (SELECT doc_id, COUNT(*) AS n FROM allg GROUP BY doc_id),
         wmin AS (
           SELECT g1.doc_id, g1.pos AS t, LEAST(10, nw.n) AS we, MIN(g2.gh) AS mg
           FROM allg g1 JOIN nw USING (doc_id)
           JOIN allg g2 ON g2.doc_id = g1.doc_id
             AND g2.pos BETWEEN g1.pos AND g1.pos + LEAST(10, nw.n) - 1
           WHERE g1.pos <= nw.n - LEAST(10, nw.n) + 1
           GROUP BY 1, 2, 3),
         sel AS (
           SELECT w.doc_id, MAX(g2.pos) AS pos, w.mg AS gh
           FROM wmin w JOIN allg g2 ON g2.doc_id = w.doc_id AND g2.gh = w.mg
             AND g2.pos BETWEEN w.t AND w.t + w.we - 1
           GROUP BY w.doc_id, w.t, w.mg),
         g AS (SELECT DISTINCT doc_id, gh FROM sel),
         d AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) <= 50)
         SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS shared
         FROM g a JOIN g b USING (gh) JOIN d USING (gh)
         WHERE a.doc_id < b.doc_id
         GROUP BY 1, 2
         HAVING COUNT(*) >= 2""",
    "q107_incr_substring" ->
      """WITH g AS (
           SELECT doc_id, unnest(list_distinct(list_filter(list_transform(
             range(1, greatest(length(text) - 99, 0) + 1),
             i -> ('0x' || substr(md5(substr(text, CAST(i AS INTEGER), 100)), 1, 15))::BIGINT),
             h -> h % 4 = 0))) AS gh
           FROM documents),
         d AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) <= 50),
         p AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS shared
           FROM g a JOIN g b USING (gh) JOIN d USING (gh)
           WHERE a.doc_id < b.doc_id
           GROUP BY 1, 2
           HAVING COUNT(*) >= 2),
         pr AS (
           SELECT id1 AS b, id2 AS x FROM p
           UNION ALL
           SELECT id2 AS b, id1 AS x FROM p)
         SELECT doc_id FROM documents bt
         WHERE doc_id % 5 = 0 AND NOT EXISTS (
           SELECT 1 FROM pr
           WHERE pr.b = bt.doc_id
             AND (pr.x % 5 <> 0 OR pr.x < bt.doc_id))""",
    "q108_lm_perplexity" ->
      """WITH tok AS (
           SELECT doc_id, lang,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
           FROM documents),
         bg AS (
           SELECT doc_id, lang,
             unnest(list_transform(range(1, len(t)), i ->
               [t[CAST(i AS INTEGER)], t[CAST(i + 1 AS INTEGER)]])) AS p
           FROM tok WHERE len(t) >= 2),
         cb AS (SELECT p[1] AS w1, p[2] AS w2, COUNT(*) AS c12
                FROM bg WHERE lang = 'en' GROUP BY 1, 2),
         ch AS (SELECT w1, SUM(c12) AS c1 FROM cb GROUP BY 1),
         vv AS (SELECT CAST(COUNT(DISTINCT w) AS DOUBLE) AS v
                FROM (SELECT unnest(t) AS w FROM tok WHERE lang = 'en')),
         lp AS (
           SELECT b.doc_id,
             CASE WHEN ch.c1 IS NOT NULL AND cb.c12 IS NOT NULL
                    THEN ln(cb.c12 + 0.5) - ln(ch.c1 + 0.5 * vv.v)
                  WHEN ch.c1 IS NOT NULL
                    THEN ln(0.5) - ln(ch.c1 + 0.5 * vv.v)
                  ELSE -ln(vv.v) END AS lp
           FROM bg b
           LEFT JOIN cb ON b.p[1] = cb.w1 AND b.p[2] = cb.w2
           LEFT JOIN ch ON b.p[1] = ch.w1
           CROSS JOIN vv),
         agg AS (
           SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             AVG(lp) AS a
           FROM lp GROUP BY doc_id)
         SELECT doc_id, n_bigrams, round(a, 6) AS avg_lp,
           round(exp(-a), 4) AS ppl, round(exp(-a), 4) > 32.0 AS flagged
         FROM agg""",
    "q109_nb_langid" -> (NbScoreCtes + """,
         pred AS (
           SELECT doc_id, cls AS pred FROM sc
           QUALIFY row_number() OVER (
             PARTITION BY doc_id ORDER BY s DESC, cls ASC) = 1)
         SELECT p.doc_id, p.pred, d.lang, p.pred = d.lang AS correct
         FROM pred p JOIN documents d USING (doc_id)"""),
    // margins are differences of the 6dp-rounded sc.s values, so the
    // binning replays bit-exactly (no exp/softmax in the decision path)
    "q136_nb_calibration" -> (NbScoreCtes + """,
         rk AS (
           SELECT doc_id, cls, s, row_number() OVER (
             PARTITION BY doc_id ORDER BY s DESC, cls ASC) AS rn
           FROM sc),
         -- LEFT join + capped COALESCE: a single-class model has no
         -- runner-up — those docs carry the cap (= top bin), matching
         -- the Spark side's sentinel instead of vanishing
         mg AS (
           SELECT a.doc_id, a.cls AS pred,
             COALESCE(LEAST(a.s - b.s, 20.0), 20.0) AS margin
           FROM rk a LEFT JOIN rk b
             ON a.doc_id = b.doc_id AND b.rn = 2
           WHERE a.rn = 1)
         SELECT LEAST(CAST(FLOOR(m.margin / 2.0) AS BIGINT), 9) AS margin_bin,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE m.pred = d.lang) AS n_correct,
           ROUND(CAST(COUNT(*) FILTER (WHERE m.pred = d.lang) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
         FROM mg m JOIN documents d USING (doc_id)
         GROUP BY 1"""),
    "q115_substring_scrub" ->
      """WITH g AS (
           SELECT doc_id, u.pos AS pos, u.gh AS gh FROM (
             SELECT doc_id, unnest(list_filter(list_transform(
               range(1, greatest(length(text) - 99, 0) + 1),
               i -> {'pos': CAST(i AS INTEGER),
                     'gh': ('0x' || substr(md5(substr(text, CAST(i AS INTEGER), 100)), 1, 15))::BIGINT}),
               s -> s.gh % 4 = 0)) AS u
             FROM documents)),
         k AS (
           SELECT gh, MIN(doc_id) AS keeper, COUNT(DISTINCT doc_id) AS df
           FROM g GROUP BY gh),
         cuts AS (
           SELECT DISTINCT g.doc_id, g.pos
           FROM g JOIN k USING (gh)
           WHERE k.df >= 2 AND k.df <= 50 AND g.doc_id <> k.keeper),
         covered AS (
           SELECT DISTINCT doc_id, pos + o AS i FROM (
             SELECT doc_id, pos, unnest(range(0, 100)) AS o FROM cuts)),
         chars AS (
           SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
           FROM documents),
         clean AS (
           SELECT c.doc_id,
             string_agg(CASE WHEN cov.i IS NULL
               THEN substr(c.text, CAST(c.i AS INTEGER), 1) ELSE '' END,
               '' ORDER BY c.i) AS clean_text,
             CAST(SUM(CASE WHEN cov.i IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_cut_chars
           FROM chars c
           LEFT JOIN covered cov ON c.doc_id = cov.doc_id AND c.i = cov.i
           GROUP BY c.doc_id)
         SELECT d.doc_id,
           COALESCE(cl.clean_text, d.text) AS clean_text,
           COALESCE(cl.n_cut_chars, 0) AS n_cut_chars
         FROM documents d LEFT JOIN clean cl USING (doc_id)""",
    "q116_incremental_scrub" ->
      """WITH g AS (
           SELECT doc_id, u.pos AS pos, u.gh AS gh FROM (
             SELECT doc_id, unnest(list_filter(list_transform(
               range(1, greatest(length(text) - 99, 0) + 1),
               i -> {'pos': CAST(i AS INTEGER),
                     'gh': ('0x' || substr(md5(substr(text, CAST(i AS INTEGER), 100)), 1, 15))::BIGINT}),
               s -> s.gh % 4 = 0)) AS u
             FROM documents)),
         k AS (
           SELECT gh, MIN(doc_id) AS keeper, COUNT(DISTINCT doc_id) AS df
           FROM g GROUP BY gh),
         cuts AS (
           SELECT DISTINCT g.doc_id, g.pos
           FROM g JOIN k USING (gh)
           WHERE k.df >= 2 AND k.df <= 50 AND g.doc_id <> k.keeper
             AND g.doc_id % 5 = 0),
         covered AS (
           SELECT DISTINCT doc_id, pos + o AS i FROM (
             SELECT doc_id, pos, unnest(range(0, 100)) AS o FROM cuts)),
         chars AS (
           SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
           FROM documents WHERE doc_id % 5 = 0),
         clean AS (
           SELECT c.doc_id,
             string_agg(CASE WHEN cov.i IS NULL
               THEN substr(c.text, CAST(c.i AS INTEGER), 1) ELSE '' END,
               '' ORDER BY c.i) AS clean_text,
             CAST(SUM(CASE WHEN cov.i IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_cut_chars
           FROM chars c
           LEFT JOIN covered cov ON c.doc_id = cov.doc_id AND c.i = cov.i
           GROUP BY c.doc_id)
         SELECT d.doc_id,
           COALESCE(cl.clean_text, d.text) AS clean_text,
           COALESCE(cl.n_cut_chars, 0) AS n_cut_chars
         FROM (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0) d
         LEFT JOIN clean cl USING (doc_id)""",
    "q114_cluster_prune" ->
      """WITH cent AS (
           SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS cid, embedding
           FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)),
         cn AS (SELECT cid, embedding,
                 sqrt(list_sum(list_transform(range(1, len(embedding)+1), k ->
                   CAST(embedding[k] AS DOUBLE) * CAST(embedding[k] AS DOUBLE)))) AS nrm FROM cent),
         en AS (SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(range(1, len(embedding)+1), k ->
                   CAST(embedding[k] AS DOUBLE) * CAST(embedding[k] AS DOUBLE)))) AS nrm FROM embeddings),
         asg AS (
           SELECT e.vec_id, a.cid AS bucket, a.cosv AS proto
           FROM en e, LATERAL (
             SELECT c.cid,
               CASE WHEN e.nrm * c.nrm = 0 THEN 0.0
                    ELSE list_sum(list_transform(range(1, len(e.embedding)+1), k ->
                           CAST(e.embedding[k] AS DOUBLE) * CAST(c.embedding[k] AS DOUBLE))) /
                         (e.nrm * c.nrm) END AS cosv
             FROM cn c ORDER BY cosv DESC, c.cid DESC LIMIT 1) a),
         sel AS (
           SELECT bucket, vec_id, proto,
             row_number() OVER (PARTITION BY bucket
               ORDER BY proto ASC, vec_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY bucket) AS n
           FROM asg)
         SELECT bucket, vec_id, round(proto, 6) AS proto
         FROM sel WHERE rn <= ceil(0.4 * n)""",
    "q113_snapshot_drift" ->
      """WITH f1 AS (
           SELECT DISTINCT source, md5(LOWER(TRIM(text))) AS fp
           FROM documents WHERE doc_id % 7 <> 0),
         f2 AS (
           SELECT DISTINCT source, md5(LOWER(TRIM(text))) AS fp
           FROM documents WHERE doc_id % 5 <> 0),
         diff AS (
           SELECT COALESCE(f1.source, f2.source) AS source,
             CAST(SUM(CASE WHEN f1.fp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
             CAST(SUM(CASE WHEN f2.fp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
             CAST(SUM(CASE WHEN f1.fp IS NOT NULL AND f2.fp IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
           FROM f1 FULL OUTER JOIN f2
             ON f1.source = f2.source AND f1.fp = f2.fp
           GROUP BY 1),
         t1 AS (
           SELECT source, w, COUNT(*) AS c FROM (
             SELECT source, unnest(list_filter(
               string_split(lower(text), ' '), x -> x <> '')) AS w
             FROM documents WHERE doc_id % 7 <> 0)
           GROUP BY 1, 2),
         t2 AS (
           SELECT source, w, COUNT(*) AS c FROM (
             SELECT source, unnest(list_filter(
               string_split(lower(text), ' '), x -> x <> '')) AS w
             FROM documents WHERE doc_id % 5 <> 0)
           GROUP BY 1, 2),
         j AS (
           SELECT COALESCE(t1.source, t2.source) AS source,
             COALESCE(t1.c, 0) AS c1, COALESCE(t2.c, 0) AS c2
           FROM t1 FULL OUTER JOIN t2
             ON t1.source = t2.source AND t1.w = t2.w),
         tot AS (
           SELECT source, SUM(c1) AS n1, SUM(c2) AS n2,
             CAST(COUNT(*) AS DOUBLE) AS v
           FROM j GROUP BY 1),
         kl AS (
           SELECT j.source,
             SUM(((j.c2 + 0.5) / (tot.n2 + 0.5 * tot.v)) *
                 (ln((j.c2 + 0.5) / (tot.n2 + 0.5 * tot.v)) -
                  ln((j.c1 + 0.5) / (tot.n1 + 0.5 * tot.v)))) AS kl
           FROM j JOIN tot USING (source) GROUP BY 1)
         SELECT d.source, d.n_added, d.n_removed, d.n_kept,
           round(kl.kl, 6) AS kl
         FROM diff d JOIN kl USING (source)""",
    "q111_lm_admission" ->
      """WITH tok AS (
           SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
           FROM documents),
         bg AS (
           SELECT doc_id,
             unnest(list_transform(range(1, len(t)), i ->
               [t[CAST(i AS INTEGER)], t[CAST(i + 1 AS INTEGER)]])) AS p
           FROM tok WHERE len(t) >= 2),
         cb AS (SELECT p[1] AS w1, p[2] AS w2, COUNT(*) AS c12
                FROM bg WHERE doc_id % 5 <> 0 GROUP BY 1, 2),
         ch AS (SELECT w1, SUM(c12) AS c1 FROM cb GROUP BY 1),
         vv AS (SELECT CAST(COUNT(DISTINCT w) AS DOUBLE) AS v
                FROM (SELECT unnest(t) AS w FROM tok WHERE doc_id % 5 <> 0)),
         lp AS (
           SELECT b.doc_id,
             CASE WHEN ch.c1 IS NOT NULL AND cb.c12 IS NOT NULL
                    THEN ln(cb.c12 + 0.5) - ln(ch.c1 + 0.5 * vv.v)
                  WHEN ch.c1 IS NOT NULL
                    THEN ln(0.5) - ln(ch.c1 + 0.5 * vv.v)
                  ELSE -ln(vv.v) END AS lp
           FROM bg b
           LEFT JOIN cb ON b.p[1] = cb.w1 AND b.p[2] = cb.w2
           LEFT JOIN ch ON b.p[1] = ch.w1
           CROSS JOIN vv
           WHERE b.doc_id % 5 = 0)
         SELECT doc_id FROM (
           SELECT doc_id, AVG(lp) AS a FROM lp GROUP BY doc_id)
         WHERE round(exp(-a), 4) <= 33.0""",
    "q110_hard_negatives" ->
      """WITH a AS (
           SELECT label AS anchor_label, MIN(vec_id) AS aid
           FROM embeddings GROUP BY 1),
         av AS (
           SELECT a.anchor_label, e.embedding AS avec
           FROM a JOIN embeddings e ON e.vec_id = a.aid),
         c AS (
           SELECT av.anchor_label, e.vec_id,
             list_sum(list_transform(range(1, len(e.embedding) + 1),
               j -> CAST(e.embedding[j] AS DOUBLE) * CAST(av.avec[j] AS DOUBLE))) /
             (NULLIF(sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                 j -> CAST(e.embedding[j] AS DOUBLE) * CAST(e.embedding[j] AS DOUBLE)))) *
               sqrt(list_sum(list_transform(range(1, len(av.avec) + 1),
                 j -> CAST(av.avec[j] AS DOUBLE) * CAST(av.avec[j] AS DOUBLE)))), 0)) AS sim
           FROM embeddings e CROSS JOIN av
           WHERE e.label <> av.anchor_label)
         SELECT anchor_label, CAST(rn AS BIGINT) AS rank, vec_id,
           round(sim, 6) AS sim
         FROM (
           SELECT *, row_number() OVER (
             PARTITION BY anchor_label ORDER BY sim DESC, vec_id ASC) AS rn
           FROM c)
         WHERE rn <= 10""",
    "q104_bpe_pairs" ->
      """WITH w AS (
           SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
           FROM documents),
         wf AS (SELECT word, COUNT(*) AS f FROM w GROUP BY word),
         p AS (
           SELECT f, unnest(list_transform(range(1, length(word)), i ->
             substr(word, CAST(i AS INTEGER), 2))) AS pair
           FROM wf)
         SELECT substr(pair, 1, 1) AS sym1, substr(pair, 2, 1) AS sym2,
           CAST(SUM(f) AS BIGINT) AS cnt
         FROM p GROUP BY 1, 2
         ORDER BY cnt DESC, sym1 ASC, sym2 ASC LIMIT 30""",
    "q85_sketch_audit" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows,
         COUNT(DISTINCT l_orderkey) AS n_orders,
         TRUE AS hll_ok, TRUE AS p50_ok
         FROM lineitem GROUP BY l_returnflag""",
    "q87_heavy_hitters" ->
      """WITH tok AS (
           SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
           FROM documents)
         SELECT term, COUNT(*) AS n, TRUE AS cms_ok
         FROM tok GROUP BY term
         ORDER BY n DESC, term LIMIT 20""",
    // identical planted text, identical RE2/Java-intersection patterns,
    // identical replace order; DuckDB needs the 'g' flag for replace-all
    "q88_pii_scrub" ->
      """WITH planted AS (
           SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR) ||
             '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
             '.7 call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(text, '\b\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
             '\b\d{3}-\d{4}\b', '[PHONE]', 'g') AS scrubbed
         FROM planted""",
    // q89 (round-15 re-registration): the derived-⌈√N⌉ exact-Lloyd
    // quantizer chain q158 oracle-proved (kmeansExactAsgCtes — 6dp
    // fixed-point integer Lloyd sums, sim DESC / cid DESC assignment
    // tie-break = Spark's array_max over (sim, cid) structs), then
    // within-cluster pairs; WHERE uses the unrounded cosine like Spark
    "q89_semantic_dedup" ->
      (kmeansExactAsgCtes(2) + """,
         capped AS (
           SELECT * FROM asg
           -- mirror Spark's semanticDedupPairs maxBucketSize=10000 guard
           QUALIFY COUNT(*) OVER (PARTITION BY bucket) <= 10000),
         prs AS (
           SELECT a.bucket, a.vec_id AS id1, b.vec_id AS id2,
             CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
                  ELSE list_sum(list_transform(range(1, len(a.embedding)+1), k ->
                         CAST(a.embedding[k] AS DOUBLE) * CAST(b.embedding[k] AS DOUBLE))) / (a.nrm * b.nrm) END AS cos
           FROM capped a JOIN capped b
             ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         SELECT bucket, id1, id2, ROUND(cos, 6) AS cos_sim
         FROM prs WHERE cos >= 0.4"""),
    // q162: cap accounting over BOTH SemDeDup sizings — the m=8 seed
    // sample (retired from q89, kept measurable) and the derived
    // exact-Lloyd quantizer (q89's current form, same CTE chain)
    "q162_semdedup_cap_report" ->
      (kmeansExactAsgCtes(2) + """,
         cent8 AS (
           SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS cid, embedding
           FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)),
         cn8 AS (SELECT cid, embedding,
                 sqrt(list_sum(list_transform(range(1, len(embedding)+1), k ->
                   CAST(embedding[k] AS DOUBLE) * CAST(embedding[k] AS DOUBLE)))) AS nrm FROM cent8),
         asg8 AS (
           SELECT e.vec_id,
             (SELECT c.cid FROM cn8 c
              ORDER BY CASE WHEN e.nrm * c.nrm = 0 THEN 0.0
                       ELSE list_sum(list_transform(range(1, len(e.embedding)+1), k ->
                              CAST(e.embedding[k] AS DOUBLE) * CAST(c.embedding[k] AS DOUBLE))) / (e.nrm * c.nrm) END DESC,
                       c.cid DESC
              LIMIT 1) AS bucket
           FROM en e),
         sz8 AS (SELECT bucket, COUNT(*) AS sz FROM asg8 GROUP BY 1),
         szd AS (SELECT bucket, COUNT(*) AS sz FROM asg GROUP BY 1)
         SELECT 'fixed_m8' AS sizing, COUNT(*) AS n_buckets,
           CAST(SUM(CASE WHEN sz > 10000 THEN 1 ELSE 0 END) AS BIGINT) AS capped_buckets,
           CAST(SUM(CASE WHEN sz > 10000 THEN sz ELSE 0 END) AS BIGINT) AS dropped_vectors,
           CAST(SUM(sz) AS BIGINT) AS total_vectors
         FROM sz8
         UNION ALL
         SELECT 'derived_sqrtn' AS sizing, COUNT(*) AS n_buckets,
           CAST(SUM(CASE WHEN sz > 10000 THEN 1 ELSE 0 END) AS BIGINT) AS capped_buckets,
           CAST(SUM(CASE WHEN sz > 10000 THEN sz ELSE 0 END) AS BIGINT) AS dropped_vectors,
           CAST(SUM(sz) AS BIGINT) AS total_vectors
         FROM szd"""),
    // the oracle replays the admission decision from the whole-corpus pair
    // table: a batch doc (doc_id % 5 = 0) is rejected when a verified pair
    // links it to any smaller-id doc (history or earlier batch) or to a
    // larger-id HISTORY doc — exactly incrementalDedupBatch's predicate
    "q90_incremental_dedup" -> (MinHashOracleCtes +
      """SELECT d.doc_id FROM documents d
         WHERE d.doc_id % 5 = 0 AND NOT EXISTS (
           SELECT 1 FROM pairs p WHERE p.jaccard >= 0.5 AND (
             p.id2 = d.doc_id OR
             (p.id1 = d.doc_id AND p.id2 % 5 <> 0)))"""),
    // the oracle's single window IS the semantics; Spark refuses the
    // parallelism-1 plan and reproduces it with the two-phase prefix sum
    "q91_quality_budget" -> ("WITH " + CurationCtes + """,
         fr AS (
           SELECT f.doc_id, f.quality, CAST(len(c.toks) AS BIGINT) AS n_tokens
           FROM feats f JOIN ct c USING (doc_id))
         SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY quality DESC, doc_id) AS BIGINT) AS global_rank,
           CAST(SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         FROM fr"""),
    "q83_source_scorecard" -> ("WITH " + CurationCtes + """,
         scrd AS (
           SELECT d.source, f.lang_pred, f.quality, len(c.toks) AS nt
           FROM documents d
           JOIN feats f USING (doc_id)
           JOIN ct c USING (doc_id))
         SELECT source, COUNT(*) AS n_docs,
           ROUND(CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_quality,
           ROUND(CAST(SUM(nt) AS DOUBLE) / COUNT(*), 6) AS avg_tokens,
           CAST(SUM(CASE WHEN lang_pred = 'und' THEN 1 ELSE 0 END) AS BIGINT) AS n_und
         FROM scrd GROUP BY source"""),
    "q82_dup_histogram" ->
      """WITH fam AS (
           SELECT md5(LOWER(TRIM(text))) AS fp, COUNT(*) AS cluster_size
           FROM documents GROUP BY 1)
         SELECT cluster_size, COUNT(*) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
         FROM fam GROUP BY cluster_size""",
    "q80_rare_token_ratio" ->
      """WITH tok AS (
           SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
           FROM documents),
         dfq AS (
           SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1)
         SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN df < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
           ROUND(CAST(SUM(CASE WHEN df < 3 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS rare_ratio
         FROM tok JOIN dfq USING (term)
         GROUP BY doc_id""",
    "q81_corpus_summary" ->
      """SELECT COUNT(*) AS n_docs,
         CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS n_tokens,
         COUNT(DISTINCT md5(LOWER(TRIM(text)))) AS n_unique_docs,
         COUNT(DISTINCT lang) AS n_langs,
         CAST(MAX(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS max_doc_tokens
         FROM documents""",
    "q79_chunk_manifest" ->
      """WITH t AS (
           SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (
           SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
           FROM t),
         spans AS (
           SELECT doc_id, n_tokens, "offset",
             unnest(generate_series("offset" // 2048,
               ("offset" + GREATEST(n_tokens, 1) - 1) // 2048)) AS chunk_id
           FROM c WHERE n_tokens > 0)
         SELECT chunk_id, COUNT(*) AS n_docs,
           CAST(SUM(LEAST("offset" + n_tokens, (chunk_id + 1) * 2048) -
                    GREATEST("offset", chunk_id * 2048)) AS BIGINT) AS n_tokens
         FROM spans GROUP BY chunk_id""",
    "q63_quantize_int8" ->
      """WITH m AS (
           SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
           FROM embeddings),
         q AS (
           SELECT vec_id, embedding, maxabs,
             CASE WHEN maxabs = 0 THEN list_transform(embedding, x -> 0)
                  ELSE list_transform(embedding, x ->
                         CAST(trunc(CAST(x AS DOUBLE) / (maxabs / 127.0)) AS INTEGER))
             END AS qv
           FROM m)
         SELECT vec_id,
           ROUND(maxabs / 127.0, 6) AS scale,
           CAST(list_sum(list_transform(qv, x -> CAST(x * x AS BIGINT))) AS BIGINT) AS qnorm2,
           ROUND(list_max(list_transform(range(1, len(embedding) + 1), k ->
             abs(CAST(embedding[k] AS DOUBLE) - qv[k] * (maxabs / 127.0)))), 6) AS max_err
         FROM q""",
    "q35_rolling_hash" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents),
         h AS (SELECT doc_id, list_transform(toks, tk -> ('0x' || substr(md5(tk),1,15))::BIGINT % 2147483647) AS hs FROM t)
         SELECT doc_id, CAST(list_reduce(list_prepend(0::BIGINT, hs), (a, b) -> (a * 1000003 + b) % 2147483647) AS BIGINT) AS rhash FROM h""")

  /** Shared CTE chain replaying the portable MinHash/LSH pipeline in DuckDB
    * (shingles → md5-60 signatures → band hashes → bucket pairs → exact
    * Jaccard). The q34 media-feature oracle relies on the documents corpus
    * being ASCII (byte == codepoint), which holds for the driver testdata.
    */
  /** DuckDB CTE chain replaying q62's curation prefix: exact dedup first
    * (q20's fingerprint, min-id keeps), then the lang-ID (q23's rule) and
    * quality-score (q24's formula) gates. Ends with `exact`, the
    * deduped-and-gated corpus the near-dup chain (MinHashOracleCtes,
    * retargeted) then runs over.
    */
  private def CurationCtes: String =
    """ct AS (
         SELECT doc_id, text,
           list_filter(string_split(text, ' '), x -> x <> '') AS toks,
           list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS ltoks
         FROM documents),
       ch AS (
         SELECT doc_id,
           len(list_filter(ltoks, x -> list_contains(['the','and','of','to','is'], x))) AS h_en,
           len(list_filter(ltoks, x -> list_contains(['der','die','und','das','ist'], x))) AS h_de,
           len(list_filter(ltoks, x -> list_contains(['le','la','et','les','est'], x))) AS h_fr,
           len(list_filter(ltoks, x -> list_contains(['el','los','las','una','es'], x))) AS h_es,
           len(list_filter(ltoks, x -> list_contains(['de5','shi4','le5','zai4','he2'], x))) AS h_zh
         FROM ct),
       cs AS (
         SELECT doc_id,
           LEAST(len(toks) / 20.0, 1.0) AS len_score,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) / length(text)
           END AS punct_ratio,
           CASE WHEN len(ltoks) = 0 THEN 0.0
                ELSE len(list_filter(ltoks, x -> list_contains(
                       ['the','a','an','and','or','of','to','in','is','it',
                        'for','on','with','as','at','by','from','that','this'], x))) / len(ltoks)
           END AS sw_ratio
         FROM ct),
       feats AS (
         SELECT h.doc_id,
           CASE WHEN GREATEST(h_en, h_de, h_fr, h_es, h_zh) = 0 THEN 'und'
                WHEN h_en = GREATEST(h_en, h_de, h_fr, h_es, h_zh) THEN 'en'
                WHEN h_de = GREATEST(h_en, h_de, h_fr, h_es, h_zh) THEN 'de'
                WHEN h_fr = GREATEST(h_en, h_de, h_fr, h_es, h_zh) THEN 'fr'
                WHEN h_es = GREATEST(h_en, h_de, h_fr, h_es, h_zh) THEN 'es'
                ELSE 'zh' END AS lang_pred,
           ROUND(s.len_score * 0.5 + (1.0 - LEAST(s.punct_ratio * 4.0, 1.0)) * 0.25
                 + LEAST(s.sw_ratio * 5.0, 1.0) * 0.25, 6) AS quality
         FROM ch h JOIN cs s USING (doc_id)),
       keep1 AS (
         SELECT MIN(doc_id) AS doc_id
         FROM (SELECT doc_id, md5(LOWER(TRIM(text))) AS fingerprint FROM documents)
         GROUP BY fingerprint),
       exact AS (
         SELECT d.doc_id, d.text, f.lang_pred, f.quality
         FROM documents d JOIN keep1 USING (doc_id) JOIN feats f USING (doc_id)
         WHERE f.lang_pred <> 'und' AND f.quality >= 0.5)"""

  /** DuckDB replay of the SQ8 IVF index (q68): same centroid/bucket/probe
    * chain as `IvfTopKOracle`, but scoring runs over the int8-truncation-
    * quantized vectors (q63's exact-replayable quantization) — cosine is
    * scale-invariant, so the quantized ints score directly.
    */
  private def IvfSq8Oracle: String =
    """WITH cent AS (
           SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS cid, embedding
           FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)),
         qv AS (SELECT embedding AS qe,
                 sqrt(list_sum(list_transform(range(1, len(embedding)+1), k ->
                   CAST(embedding[k] AS DOUBLE) * CAST(embedding[k] AS DOUBLE)))) AS nrm
                FROM embeddings WHERE vec_id = 0),
         cn AS (SELECT cid, embedding,
                 sqrt(list_sum(list_transform(range(1, len(embedding)+1), k ->
                   CAST(embedding[k] AS DOUBLE) * CAST(embedding[k] AS DOUBLE)))) AS nrm FROM cent),
         en AS (SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(range(1, len(embedding)+1), k ->
                   CAST(embedding[k] AS DOUBLE) * CAST(embedding[k] AS DOUBLE)))) AS nrm FROM embeddings),
         asg AS (
           SELECT e.vec_id, e.embedding, e.nrm,
             (SELECT c.cid FROM cn c
              ORDER BY CASE WHEN e.nrm * c.nrm = 0 THEN 0.0
                       ELSE list_sum(list_transform(range(1, len(e.embedding)+1), k ->
                              CAST(e.embedding[k] AS DOUBLE) * CAST(c.embedding[k] AS DOUBLE))) / (e.nrm * c.nrm) END DESC,
                       c.cid DESC
              LIMIT 1) AS bucket
           FROM en e),
         probe AS (
           SELECT c.cid FROM cn c, qv
           ORDER BY CASE WHEN c.nrm * qv.nrm = 0 THEN 0.0
                    ELSE list_sum(list_transform(range(1, len(c.embedding)+1), k ->
                           CAST(c.embedding[k] AS DOUBLE) * CAST(qv.qe[k] AS DOUBLE))) / (c.nrm * qv.nrm) END DESC,
                    c.cid ASC
           LIMIT 3),
         mq AS (
           SELECT vec_id, bucket, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
           FROM asg WHERE bucket IN (SELECT cid FROM probe)),
         qq AS (
           SELECT vec_id,
             CASE WHEN maxabs = 0 THEN list_transform(embedding, x -> 0)
                  ELSE list_transform(embedding, x ->
                         CAST(trunc(CAST(x AS DOUBLE) / (maxabs / 127.0)) AS INTEGER))
             END AS qvec
           FROM mq),
         qn AS (
           SELECT vec_id, qvec,
             sqrt(list_sum(list_transform(range(1, len(qvec)+1), k ->
               CAST(qvec[k] AS DOUBLE) * CAST(qvec[k] AS DOUBLE)))) AS nrm
           FROM qq)
         SELECT vec_id FROM (
           SELECT q2.vec_id,
             CASE WHEN q2.nrm * qv.nrm = 0 THEN 0.0
                  ELSE list_sum(list_transform(range(1, len(q2.qvec)+1), k ->
                         CAST(q2.qvec[k] AS DOUBLE) * CAST(qv.qe[k] AS DOUBLE))) / (q2.nrm * qv.nrm) END AS sim
           FROM qn q2, qv)
         ORDER BY sim DESC, vec_id ASC LIMIT 10"""

  /** DuckDB replay of the IVF probe pipeline (deterministic seed centroids →
    * argmax bucket assignment → nprobe=3 probe → exact cosine over probed
    * buckets, ties broken by vec_id). Shared by q33 (in-memory bucketing)
    * and q61 (parquet-partitioned index) — the physical layout differs, the
    * algebra and therefore the oracle are identical.
    */
  /** The IVF coarse-quantizer CTEs shared by the single-probe oracle
    * (q33/q61), the batched-probe oracle (q132): seed centroids = the 8
    * smallest-id vectors, norms, and the per-vector bucket assignment
    * (argmax cosine, ties to the LARGER cid — `assignBuckets`'
    * struct-max tie-break).
    */
  /** The batched-probe IVF oracle chain up through `annres` (query_id,
    * vec_id — the top-10 per probe) over any assignment CTE block:
    * shared by the search final (q132) and the recall audit finals
    * (q137 full probe set, q152 md5-sampled probe set via `probePred`),
    * all on the derived-⌈√N⌉ quantizer ([[AutoCentCte]]). */
  /** The recall@k aggregation over the [[ivfBatchCtesOf]] chain: exact
    * brute top-10 per audited query, left-joined against `annres`,
    * per-query hit count and recall (denominator = the exact result
    * size, so sub-k corpora still score 1.0 on a perfect search).
    * Shared by q137 (full probe set) and q152 (sampled probe set). */
  private def RecallAuditTail: String = """,
         brute AS (
           SELECT query_id, vec_id FROM (
             SELECT q.query_id, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                 CASE WHEN e.nrm * q.qnrm = 0 THEN 0.0
                      ELSE list_sum(list_transform(range(1, len(e.embedding)+1), k ->
                             CAST(e.embedding[k] AS DOUBLE) * CAST(q.qe[k] AS DOUBLE)))
                           / (e.nrm * q.qnrm) END DESC,
                 e.vec_id ASC) AS rn
             FROM en e CROSS JOIN qs q)
           WHERE rn <= 10)
         SELECT b.query_id, COUNT(a.vec_id) AS n_hits,
           ROUND(CAST(COUNT(a.vec_id) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS recall
         FROM brute b LEFT JOIN annres a
           ON b.query_id = a.query_id AND b.vec_id = a.vec_id
         GROUP BY 1"""

  /** The q160 frozen-index seed-side derivation up through the
    * within-seed hubness stats `ws` — label-1 seed-slice quantizer
    * (⌈√Nseeds⌉ smallest-id sample), home assignment (ties to the
    * larger cid), the seed-membership cap (`sd`/`okb`), and each seed's
    * top-4 same-cluster 6dp-integer cosine sums — plus the label-0
    * batch side with norms (`xb`). Shared by the mining final (q160)
    * and the mining recall audit (q164), which runs the identical
    * decision chain twice (bucketed vs exact candidates).
    */
  private def MarginIndexCtes: String =
    """WITH sl AS (
           SELECT vec_id, embedding FROM embeddings WHERE label = 1),
         cent AS (
           SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS cid,
             embedding
           FROM sl
           QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <=
             LEAST(65536, GREATEST(1,
               CAST(ceil(sqrt((SELECT COUNT(*) FROM sl))) AS BIGINT)))),
         cn AS (SELECT cid, embedding,
                 sqrt(list_sum(list_transform(range(1, len(embedding)+1), k ->
                   CAST(embedding[k] AS DOUBLE) * CAST(embedding[k] AS DOUBLE)))) AS nrm
                FROM cent),
         sn0 AS (SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(range(1, len(embedding)+1), k ->
                   CAST(embedding[k] AS DOUBLE) * CAST(embedding[k] AS DOUBLE)))) AS nrm
                FROM embeddings WHERE label = 1),
         xb AS (SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(range(1, len(embedding)+1), k ->
                   CAST(embedding[k] AS DOUBLE) * CAST(embedding[k] AS DOUBLE)))) AS nrm
                FROM embeddings WHERE label = 0),
         sasg AS (
           SELECT s.vec_id, s.embedding, s.nrm,
             (SELECT c.cid FROM cn c
              ORDER BY CASE WHEN s.nrm * c.nrm = 0 THEN 0.0
                       ELSE list_sum(list_transform(range(1, len(s.embedding)+1), k ->
                              CAST(s.embedding[k] AS DOUBLE) * CAST(c.embedding[k] AS DOUBLE))) / (s.nrm * c.nrm) END DESC,
                       c.cid DESC
              LIMIT 1) AS bucket
           FROM sn0 s),
         sd AS (
           SELECT bucket, vec_id AS yid, embedding AS yv, nrm AS yn
           FROM sasg
           QUALIFY COUNT(*) OVER (PARTITION BY bucket) <= 10000),
         okb AS (SELECT DISTINCT bucket FROM sd),
         wsc AS (
           SELECT a.yid, b.yid AS sid,
             CAST(ROUND(CASE WHEN a.yn * b.yn = 0 THEN 0.0
               ELSE list_sum(list_transform(range(1, len(a.yv)+1), k ->
                      CAST(a.yv[k] AS DOUBLE) * CAST(b.yv[k] AS DOUBLE)))
                    / (a.yn * b.yn) END * 1000000) AS BIGINT) AS c6
           FROM sd a JOIN sd b ON a.bucket = b.bucket AND a.yid <> b.yid),
         ws AS (
           SELECT yid, SUM(c6) AS sy, COUNT(*) AS ny FROM (
             SELECT yid, c6,
               ROW_NUMBER() OVER (PARTITION BY yid
                 ORDER BY c6 DESC, sid ASC) AS rn
             FROM wsc) WHERE rn <= 4 GROUP BY yid)"""

  private def ivfBatchCtesOf(asgCtes: String,
      probePred: String = "vec_id % 500 = 0"): String = asgCtes + s""",
         qs AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qnrm
                FROM en WHERE $probePred),
         probe AS (
           SELECT query_id, cid FROM (
             SELECT q.query_id, c.cid,
               -- probe ties to the SMALLER cid, aligned with ivfTopK's
               -- probeIds (round 8: the batch form previously tied larger)
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                 CASE WHEN c.nrm * q.qnrm = 0 THEN 0.0
                      ELSE list_sum(list_transform(range(1, len(c.embedding)+1), k ->
                             CAST(c.embedding[k] AS DOUBLE) * CAST(q.qe[k] AS DOUBLE)))
                           / (c.nrm * q.qnrm) END DESC,
                 c.cid ASC) AS rn
             FROM cn c, qs q) WHERE rn <= 3),
         annres AS (
           SELECT query_id, vec_id FROM (
             SELECT p.query_id, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
                 CASE WHEN e.nrm * q.qnrm = 0 THEN 0.0
                      ELSE list_sum(list_transform(range(1, len(e.embedding)+1), k ->
                             CAST(e.embedding[k] AS DOUBLE) * CAST(q.qe[k] AS DOUBLE)))
                           / (e.nrm * q.qnrm) END DESC,
                 e.vec_id ASC) AS rn
             FROM asg e JOIN probe p ON e.bucket = p.cid
             JOIN qs q ON q.query_id = p.query_id)
           WHERE rn <= 10)"""

  /** DuckDB replay of the q109 Naive-Bayes chain up through the rounded
    * per-(doc, class) scores `sc` — shared by the labeling final (q109)
    * and the margin-calibration final (q136).
    */
  private def NbScoreCtes: String =
    """WITH tr AS (
           SELECT lang AS cls,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
           FROM documents WHERE doc_id % 10 < 8),
         te AS (
           SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
           FROM documents WHERE doc_id % 10 >= 8),
         tc AS (SELECT cls, unnest(t) AS w FROM tr),
         cwc AS (SELECT w, cls, COUNT(*) AS cwc FROM tc GROUP BY 1, 2),
         cstat AS (SELECT cls, SUM(cwc) AS n_c FROM cwc GROUP BY 1),
         nd AS (SELECT cls, COUNT(*) AS docs FROM tr GROUP BY 1),
         tot AS (SELECT SUM(docs) AS tot FROM nd),
         pri AS (
           SELECT nd.cls, ln(nd.docs) - ln(tot.tot) AS prior_lp, cstat.n_c
           FROM nd JOIN cstat USING (cls) CROSS JOIN tot),
         vv AS (SELECT CAST(COUNT(DISTINCT w) AS DOUBLE) AS v FROM tc),
         tw AS (SELECT doc_id, unnest(t) AS w FROM te),
         sc AS (
           SELECT tw.doc_id, p.cls,
             round(any_value(p.prior_lp) +
               SUM(ln(COALESCE(cwc.cwc, 0) + 0.5) -
                   ln(p.n_c + 0.5 * vv.v)), 6) AS s
           FROM tw
           CROSS JOIN pri p
           LEFT JOIN cwc ON tw.w = cwc.w AND p.cls = cwc.cls
           CROSS JOIN vv
           GROUP BY tw.doc_id, p.cls)"""

  /** DuckDB replay of the incremental cosine admission (q133 direct
    * window form AND q135 snapshot form — identical decisions by
    * construction): whole-corpus 64-plane banding, combined-population
    * bucket cap, batch×(history ∪ earlier-batch) candidates, exact
    * cosine verify at 0.35, with the band width itself derived in SQL
    * from count(*) — the `indexParams` width ladder (16-bit to 2¹⁶
    * vectors, 32-bit to 2³², 64-bit beyond). */
  private def IncrCosineAutoOracle: String = incrCosineOracleWith(
    """bw AS (SELECT CASE WHEN COUNT(*) <= 65536 THEN 16
                          WHEN COUNT(*) <= 4294967296 THEN 32
                          ELSE 64 END AS pb FROM embeddings),
         """,
    "(SELECT pb FROM bw)")

  private def incrCosineOracleWith(preCte: String, pb: String): String =
    s"""WITH ${preCte}planes AS (
           SELECT p, list_transform(range(0, 64), k ->
             CASE WHEN (('0x' || substr(md5(p::VARCHAR || ',' || k::VARCHAR),1,15))::BIGINT & 1) = 1
                  THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END) AS pv
           FROM range(0, 64) t(p)),
         sb AS (
           SELECT e.vec_id, p.p,
             CASE WHEN list_sum(list_transform(range(1, len(e.embedding) + 1), k ->
                    p.pv[k] * CAST(e.embedding[k] AS DOUBLE))) >= 0 THEN 1 ELSE 0 END AS bit
           FROM embeddings e, planes p),
         bandkeys AS (
           SELECT vec_id, p // $pb AS band,
             CAST(SUM(bit * (1::BIGINT << CAST(p % $pb AS INTEGER))) AS BIGINT) AS bits
           FROM sb GROUP BY vec_id, p // $pb
           QUALIFY COUNT(*) OVER (PARTITION BY (p // $pb),
             CAST(SUM(bit * (1::BIGINT << CAST(p % $pb AS INTEGER))) AS BIGINT)) <= 10000),
         cand AS (
           SELECT DISTINCT l.vec_id AS bid, r.vec_id AS pid
           FROM bandkeys l JOIN bandkeys r ON l.band = r.band AND l.bits = r.bits
           WHERE l.vec_id % 5 = 0 AND r.vec_id <> l.vec_id
             AND (r.vec_id % 5 <> 0 OR r.vec_id < l.vec_id)),
         wn AS (
           SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(range(1, len(embedding)+1), k ->
               CAST(embedding[k] AS DOUBLE) * CAST(embedding[k] AS DOUBLE)))) AS nrm
           FROM embeddings),
         rej AS (
           SELECT DISTINCT c.bid
           FROM cand c JOIN wn a ON c.bid = a.vec_id JOIN wn b ON c.pid = b.vec_id
           WHERE CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN 0.0
                 ELSE list_sum(list_transform(range(1, len(a.embedding)+1), k ->
                        CAST(a.embedding[k] AS DOUBLE) * CAST(b.embedding[k] AS DOUBLE)))
                      / (a.nrm * b.nrm) END >= 0.35)
         SELECT vec_id, label FROM embeddings
         WHERE vec_id % 5 = 0 AND vec_id NOT IN (SELECT bid FROM rej)"""

  private def IvfAsgCtes: String = ivfAsgCtesWith(
    """SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS cid, embedding
           FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)""")

  /** Derived-size quantizer: the ⌈√N⌉ smallest-id vectors (capped at
    * 65536, floored at 1), N computed from the oracle's own count(*) —
    * the `Similarity.indexParams` nlist derivation replayed in SQL. */
  private def AutoCentCte: String =
    """SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS cid, embedding
           FROM embeddings
           QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <=
             LEAST(65536, GREATEST(1,
               CAST(ceil(sqrt((SELECT COUNT(*) FROM embeddings))) AS BIGINT)))"""

  /** DuckDB replay of [[graft.ext.Similarity.kmeansCentroidsExact]]'s
    * `iters` exact-Lloyd rounds over the derived-⌈√N⌉ seed sample, plus
    * the final corpus assignment — ending in the `cn`/`asg`/`en` CTE
    * names [[ivfBatchCtesOf]] expects, so the k-means search (q158)
    * rides the same probe/annres tail as the seed-sample one (q132).
    * Each round: per-bucket 6dp fixed-point integer sums (exact,
    * order-independent — the property that makes distributed Lloyd
    * replayable at all), mean via one double division, IEEE cast to
    * REAL; empty buckets COALESCE to their previous centroid.
    */
  private def kmeansExactAsgCtes(iters: Int): String = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    def nrm(emb: String) =
      s"sqrt(list_sum(list_transform(range(1, len($emb)+1), k -> " +
        s"CAST($emb[k] AS DOUBLE) * CAST($emb[k] AS DOUBLE))))"
    def argmax(cn: String) =
      s"""(SELECT c.cid FROM $cn c
              ORDER BY CASE WHEN e.nrm * c.nrm = 0 THEN 0.0
                       ELSE list_sum(list_transform(range(1, len(e.embedding)+1), k ->
                              CAST(e.embedding[k] AS DOUBLE) * CAST(c.embedding[k] AS DOUBLE))) / (e.nrm * c.nrm) END DESC,
                       c.cid DESC
              LIMIT 1)"""
    val sb = new StringBuilder(
      s"""WITH cent_0 AS (
           $AutoCentCte),
         en AS (SELECT vec_id, embedding, ${nrm("embedding")} AS nrm FROM embeddings)""")
    for (i <- 0 until iters) {
      sb.append(s""",
         cn_$i AS (SELECT cid, embedding, ${nrm("embedding")} AS nrm FROM cent_$i),
         asg_$i AS (
           SELECT e.vec_id, e.embedding, e.nrm, ${argmax(s"cn_$i")} AS bucket
           FROM en e),
         sums_${i + 1} AS (
           SELECT bucket, k,
             SUM(CAST(ROUND(CAST(embedding[k] AS DOUBLE) * 1000000) AS BIGINT)) AS s6,
             COUNT(*) AS cnt
           FROM (SELECT bucket, embedding,
                   generate_subscripts(embedding, 1) AS k FROM asg_$i)
           GROUP BY 1, 2),
         cent_${i + 1} AS (
           SELECT c.cid, COALESCE(m.emb, c.embedding) AS embedding
           FROM cent_$i c LEFT JOIN (
             SELECT bucket AS cid,
               list(CAST((CAST(s6 AS DOUBLE) / cnt) / 1000000.0 AS REAL) ORDER BY k) AS emb
             FROM sums_${i + 1} GROUP BY bucket) m ON m.cid = c.cid)""")
    }
    sb.append(s""",
         cn AS (SELECT cid, embedding, ${nrm("embedding")} AS nrm FROM cent_$iters),
         asg AS (
           SELECT e.vec_id, e.embedding, e.nrm, ${argmax("cn")} AS bucket
           FROM en e)""")
    sb.toString
  }

  private def ivfAsgCtesWith(centCte: String): String =
    s"""WITH cent AS (
           $centCte),
         cn AS (SELECT cid, embedding,
                 sqrt(list_sum(list_transform(range(1, len(embedding)+1), k ->
                   CAST(embedding[k] AS DOUBLE) * CAST(embedding[k] AS DOUBLE)))) AS nrm FROM cent),
         en AS (SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(range(1, len(embedding)+1), k ->
                   CAST(embedding[k] AS DOUBLE) * CAST(embedding[k] AS DOUBLE)))) AS nrm FROM embeddings),
         asg AS (
           SELECT e.vec_id, e.embedding, e.nrm,
             (SELECT c.cid FROM cn c
              ORDER BY CASE WHEN e.nrm * c.nrm = 0 THEN 0.0
                       ELSE list_sum(list_transform(range(1, len(e.embedding)+1), k ->
                              CAST(e.embedding[k] AS DOUBLE) * CAST(c.embedding[k] AS DOUBLE))) / (e.nrm * c.nrm) END DESC,
                       c.cid DESC
              LIMIT 1) AS bucket
           FROM en e)"""

  private def IvfTopKOracle: String =
    IvfAsgCtes + """,
         qv AS (SELECT embedding AS qe,
                 sqrt(list_sum(list_transform(range(1, len(embedding)+1), k ->
                   CAST(embedding[k] AS DOUBLE) * CAST(embedding[k] AS DOUBLE)))) AS nrm
                FROM embeddings WHERE vec_id = 0),
         probe AS (
           SELECT c.cid FROM cn c, qv
           ORDER BY CASE WHEN c.nrm * qv.nrm = 0 THEN 0.0
                    ELSE list_sum(list_transform(range(1, len(c.embedding)+1), k ->
                           CAST(c.embedding[k] AS DOUBLE) * CAST(qv.qe[k] AS DOUBLE))) / (c.nrm * qv.nrm) END DESC,
                    c.cid ASC
           LIMIT 3)
         SELECT vec_id FROM (
           SELECT e.vec_id,
             CASE WHEN e.nrm * qv.nrm = 0 THEN 0.0
                  ELSE list_sum(list_transform(range(1, len(e.embedding)+1), k ->
                         CAST(e.embedding[k] AS DOUBLE) * CAST(qv.qe[k] AS DOUBLE))) / (e.nrm * qv.nrm) END AS sim
           FROM asg e, qv WHERE e.bucket IN (SELECT cid FROM probe))
         ORDER BY sim DESC, vec_id ASC LIMIT 10"""

  /** DuckDB replay of the PQ/ADC pipeline (q105/q106): seed codebooks =
    * the 8 smallest-id vectors sliced into 4 subspaces of 16 dims;
    * per-subspace argmin squared-L2 encoding (ties to the smaller cid);
    * ADC distance = Σ over subspaces of the exact ||q_s − c[code_s]||².
    * Distance terms are double diffs summed in element order on both
    * sides, so the ranking replays exactly.
    */
  private def PqTopKOracle: String =
    PqAdcCtes + """
         SELECT vec_id FROM adc ORDER BY dist ASC, vec_id ASC LIMIT 10"""

  /** The q105 ADC chain ending at the per-vector approximate distances
    * (`adc`), shared by the plain top-k (q105/q106) and the exact-rerank
    * final (q127).
    */
  private def PqAdcCtes: String =
    """WITH cent AS (
           SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS cid, embedding
           FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)),
         gs AS (SELECT unnest(range(4)) AS s),
         sub AS (
           SELECT gs.s, c.cid,
             list_slice(c.embedding, gs.s * 16 + 1, gs.s * 16 + 16) AS c
           FROM cent c, gs),
         esub AS (
           SELECT e.vec_id, gs.s,
             list_slice(e.embedding, gs.s * 16 + 1, gs.s * 16 + 16) AS v
           FROM embeddings e, gs),
         qsub AS (
           SELECT gs.s, list_slice(embedding, gs.s * 16 + 1, gs.s * 16 + 16) AS q
           FROM embeddings, gs WHERE vec_id = 0),
         enc AS (
           SELECT vec_id, s, cid AS code FROM (
             SELECT e.vec_id, e.s, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id, e.s
                 ORDER BY list_sum(list_transform(range(1, 17), k ->
                   (CAST(e.v[k] AS DOUBLE) - CAST(c.c[k] AS DOUBLE)) *
                   (CAST(e.v[k] AS DOUBLE) - CAST(c.c[k] AS DOUBLE)))) ASC,
                   c.cid ASC) AS rn
             FROM esub e JOIN sub c ON c.s = e.s)
           WHERE rn = 1),
         lut AS (
           SELECT c.s, c.cid,
             list_sum(list_transform(range(1, 17), k ->
               (CAST(q.q[k] AS DOUBLE) - CAST(c.c[k] AS DOUBLE)) *
               (CAST(q.q[k] AS DOUBLE) - CAST(c.c[k] AS DOUBLE)))) AS d
           FROM sub c JOIN qsub q ON q.s = c.s),
         adc AS (
           SELECT enc.vec_id, SUM(l.d) AS dist
           FROM enc JOIN lut l ON l.s = enc.s AND l.cid = enc.code
           GROUP BY enc.vec_id)"""

  /** DuckDB replay of the md5-parity ±1 random projection (q72/q76): the
    * 16×64 sign matrix from md5('rp|j|k'), both sides projected, reduced-
    * space cosine top-10. The indexed variant (q76) pre-materializes the
    * projection, which cannot change scores — same oracle.
    */
  private def RprojCtes: String =
    """WITH m AS (
         SELECT gj.j, gk.k,
           CASE WHEN substr(md5('rp|' || gj.j || '|' || gk.k), 1, 1)
                     BETWEEN '0' AND '7'
                THEN 1.0 ELSE -1.0 END AS s
         FROM generate_series(0, 15) gj(j), generate_series(0, 63) gk(k)),
       q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       qp AS (
         SELECT m.j, SUM(CAST(q.qe[m.k + 1] AS DOUBLE) * m.s) AS v
         FROM m, q GROUP BY m.j),
       p AS (
         SELECT e.vec_id, m.j,
           SUM(CAST(e.embedding[m.k + 1] AS DOUBLE) * m.s) AS v
         FROM embeddings e, m GROUP BY 1, 2),
       sc AS (
         SELECT p.vec_id,
           SUM(p.v * qp.v) / NULLIF(sqrt(SUM(p.v * p.v)), 0) AS sim
         FROM p JOIN qp USING (j) GROUP BY p.vec_id)"""

  private def RprojOracle: String = RprojCtes +
    """
       SELECT vec_id FROM sc ORDER BY sim DESC, vec_id ASC LIMIT 10"""

  /** Shared CTE chain replaying the decontamination shingle pipeline
    * (q64/q75): lowercase 3-gram shingles, corpus side df-capped at 100,
    * probe side = doc_id % 50 == 0. Ends with `cf` (corpus) and `pf`
    * (probe) shingle streams.
    */
  private def ContaminationCtes: String =
    """WITH tok AS (
         SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
         FROM documents),
       sh AS (
         SELECT doc_id,
           CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                ELSE list_distinct(list_transform(range(1, len(toks) - 1), i ->
                       array_to_string(list_slice(toks, i, i + 2), ' ')))
           END AS sh
         FROM tok),
       ex AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
       cf AS (
         SELECT doc_id AS corpus_id, shingle FROM ex
         QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 100),
       pf AS (SELECT doc_id AS probe_id, shingle FROM ex WHERE doc_id % 50 = 0)"""

  private def MinHashOracleCtes: String =
    """WITH tok AS (
         SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
         FROM documents),
       sh AS (
         SELECT doc_id,
           CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                ELSE list_distinct(list_transform(range(1, len(toks) - 1), i ->
                       array_to_string(list_slice(toks, i, i + 2), ' ')))
           END AS sh
         FROM tok),
       hx AS (
         SELECT doc_id, sh, list_transform(sh, s -> md5(s)) AS hx FROM sh),
       sig AS (
         SELECT doc_id,
           list_transform(range(0, 16), i ->
             list_min(list_transform(hx, m ->
               (('0x' || substr(m,1,15))::BIGINT +
                i * (('0x' || substr(m,17,15))::BIGINT & 36028797018963967))
               & 1152921504606846975))) AS sig
         FROM hx),
       bands AS (
         SELECT doc_id, b,
           ('0x' || substr(md5(b::VARCHAR || ':' || array_to_string(list_slice(sig, b*4+1, b*4+4), ',')),1,15))::BIGINT AS band_hash
         FROM sig, range(0, 4) t(b)
         -- mirror Spark's candidatePairs maxBucketSize=1000 skew guard so the
         -- compare stays exact even if a corpus grows a degenerate bucket
         QUALIFY COUNT(*) OVER (PARTITION BY b, band_hash) <= 1000),
       cand AS (
         SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
         FROM bands l JOIN bands r ON l.b = r.b AND l.band_hash = r.band_hash
         WHERE l.doc_id < r.doc_id),
       pairs AS (
         SELECT c.id1, c.id2,
           CAST(len(list_distinct(list_intersect(s1.sh, s2.sh))) AS DOUBLE) /
           CAST(len(list_distinct(list_concat(s1.sh, s2.sh))) AS DOUBLE) AS jaccard
         FROM cand c JOIN sh s1 ON c.id1 = s1.doc_id JOIN sh s2 ON c.id2 = s2.doc_id)
       """
}

package graft.tools

import graft.core.Tables
import graft.ext.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 optimization scratch probe: phase-level timings for the
  * bench's most expensive families (layout quantile z-order, frozen
  * mining index), so changes target the measured phase instead of the
  * query total. Usage: R16Probe <sfDir> <layout|mine> [runs]
  */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = args.lift(1).getOrElse("layout")
    val runs = args.lift(2).flatMap(_.toIntOption).getOrElse(2)
    val spark = ScaleKnobs(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    for (i <- 1 to runs) {
      println(s"--- run $i ---")
      what match {
        case "layout" =>
          val li = Tables.load(spark, dir, "lineitem")
            .select(col("l_orderkey"), col("l_linenumber"),
              col("l_extendedprice"), col("l_partkey"))
          time("lineitem.count")(li.count())
          time("boundsD(l_extendedprice,64)")(
            graft.sources.Layout.bucketBounds(li, "l_extendedprice", 64))
          time("boundsL(l_partkey,64)")(
            graft.sources.Layout.bucketBoundsLong(li, "l_partkey", 64))
          time("q102 full")(
            graft.queries.Queries.q102ZorderQuantile(spark, dir).count())
          time("q163 full")(
            graft.queries.Queries.q163ZorderQuantileTime(spark, dir).count())
        case "schema" =>
          val p = s"$dir/documents.parquet"
          val sch = spark.read.parquet(p).schema
          time("20x read.parquet (inference)") {
            var k = 0
            while (k < 20) { spark.read.parquet(p); k += 1 }
          }
          time("20x read.schema().parquet") {
            var k = 0
            while (k < 20) { spark.read.schema(sch).parquet(p); k += 1 }
          }
          time("20x load+count (inference)") {
            var k = 0
            while (k < 20) { spark.read.parquet(p).count(); k += 1 }
          }
          time("20x load+count (schema given)") {
            var k = 0
            while (k < 20) { spark.read.schema(sch).parquet(p).count(); k += 1 }
          }
        case "aq" =>
          val li = Tables.load(spark, dir, "lineitem")
          time("warm scan")(li.count())
          for (np <- Seq(31, 63, 127)) {
            time(s"approxQuantile price np=$np")(
              li.select(col("l_extendedprice").cast("double").as("_v"))
                .stat.approxQuantile("_v",
                  (1 until np + 1).map(_.toDouble / (np + 1)).toArray,
                  1.0 / (2.0 * (np + 1))))
            time(s"approxQuantile partkey np=$np")(
              li.select(col("l_partkey").cast("double").as("_v"))
                .stat.approxQuantile("_v",
                  (1 until np + 1).map(_.toDouble / (np + 1)).toArray,
                  1.0 / (2.0 * (np + 1))))
          }
          val hist = li.filter(col("l_extendedprice").isNotNull)
            .groupBy(col("l_extendedprice")).agg(count(lit(1)).as("_c"))
          time("hist.count")(hist.count())
          time("boundsD full")(
            graft.sources.Layout.bucketBounds(li, "l_extendedprice", 64))
          time("boundsL full")(
            graft.sources.Layout.bucketBoundsLong(li, "l_partkey", 64))
        case "layout2" =>
          import org.apache.spark.sql.expressions.Window
          val li = Tables.load(spark, dir, "lineitem")
            .select(col("l_extendedprice"), col("l_partkey"))
          time("warm scan")(li.count())
          val hist = li.filter(col("l_extendedprice").isNotNull)
            .groupBy(col("l_extendedprice")).agg(count(lit(1)).as("_c"))
          time("hist.count (distinct prices)")(hist.count())
          val ranked = graft.operators.PrefixSum
            .withGlobalCumSum(hist, Seq(col("l_extendedprice")), col("_c"), "_cum")
          time("ranked.count (prefix sum)")(ranked.count())
          val bm = graft.sources.Layout.bucketMap(li, "l_extendedprice", 64, "_b")
          time("bucketMap.count")(bm.count())
          time("bounds full (with orderBy+collect)")(
            graft.sources.Layout.bucketBounds(li, "l_extendedprice", 64))
          // concurrent x+y bounds
          time("bounds x+y concurrent") {
            import scala.concurrent.{Await, Future}
            import scala.concurrent.duration.Duration
            import scala.concurrent.ExecutionContext.Implicits.global
            val fx = Future(graft.sources.Layout.bucketBounds(li, "l_extendedprice", 64))
            val fy = Future(graft.sources.Layout.bucketBoundsLong(li, "l_partkey", 64))
            (Await.result(fx, Duration.Inf), Await.result(fy, Duration.Inf))
          }
        case "mine" =>
          val emb = Tables.load(spark, dir, "embeddings")
          val seeds = emb.filter(col("label") === 1)
          val n = time("seeds.count")(seeds.count())
          val cents = time("sampleCentroids")(
            Similarity.sampleCentroids(seeds, Similarity.indexParams(n).nlist))
          val idx = time("buildMarginIndex (lazy)")(
            Similarity.buildMarginIndex(seeds, cents))
          time("index.sd.count")(idx.sd.count())
          time("index.within.count")(idx.within.count())
          val idxM = time("materialize()")(idx.materialize())
          time("audit on materialized idx")(
            Similarity.marginMiningRecallAuditIndexed(idxM, emb.filter(col("label") === 0),
              cents, nprobe = Similarity.nprobeForMining(0.8, 2000L)).count())
          time("q164 full (as registered)")(
            graft.queries.Queries.all("q164_mining_recall_audit")(spark, dir).count())
          time("q160 full (as registered)")(
            graft.queries.Queries.all("q160_margin_mining_ingest")(spark, dir).count())
        case other => sys.error(s"unknown probe: $other")
      }
    }
    spark.stop()
  }
}

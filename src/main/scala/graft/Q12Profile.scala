package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Component timing for the q12 transparent plan at scale: where do
  * the seconds go? (round 15 — the verdict asks for ≤1.5× vs same-day
  * DuckDB; the AQE pair said the residual is execution, not shape).
  * Usage: runMain graft.Q12Profile <sfDir> [reps] */
object Q12Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    require(
      graft.sources.Bucketing.registerExisting(spark, "li_bkt", "l_orderkey", 128) &&
        graft.sources.Bucketing.registerExisting(spark, "ord_bkt", "o_orderkey", 128),
      "bucketed layouts missing")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    import graft.queries.Det.dec4

    def t(tag: String)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        // noop sink: count() would let ColumnPruning drop the very
        // aggregates being measured
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[q12prof] $tag%-28s median=${ts(ts.size / 2)}%7.2fs reps=${ts.map(x => f"$x%.2f").mkString(",")}")
    }

    val li = spark.table("li_bkt")
    val ord = spark.table("ord_bkt")
    // 1. raw scan + decimal revenue, global sum (no grouping)
    t("li_scan_decimal_sum") {
      li.agg(sum(dec4(col("l_extendedprice") * (lit(1) - col("l_discount")))))
    }
    // 2. the same with the double expression (decimal overhead probe)
    t("li_scan_double_sum") {
      li.agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
    }
    // 3. the pre-aggregate (exchange-free grouped partial)
    t("li_preagg_decimal") {
      li.groupBy("l_orderkey")
        .agg(sum(dec4(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev"))
    }
    // 4. orders side: filter + broadcast cust join
    t("ord_filter_cust") {
      ord.filter(col("o_orderdate") >= "1996-01-01 00:00:00")
        .join(spark.read.parquet(s"$sfDir/customer.parquet")
            .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
    }
    // 5. preagg ⋈ ord (no cust) — the bucket join itself
    t("preagg_join_ord") {
      li.groupBy("l_orderkey")
        .agg(sum(dec4(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev"))
        .join(ord.filter(col("o_orderdate") >= "1996-01-01 00:00:00")
          .select("o_orderkey"), col("l_orderkey") === col("o_orderkey"))
    }
    // 6. the full transparent SQL
    spark.read.parquet(s"$wh/li_bkt").createOrReplaceTempView("li_v")
    spark.read.parquet(s"$wh/ord_bkt").createOrReplaceTempView("ord_v")
    spark.read.parquet(s"$sfDir/customer.parquet").createOrReplaceTempView("p_cust")
    spark.read.parquet(s"$sfDir/nation.parquet").createOrReplaceTempView("p_nation")
    spark.read.parquet(s"$sfDir/region.parquet").createOrReplaceTempView("p_region")
    t("full_transparent") {
      spark.sql(
        """SELECT r_name, n_name,
          |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
          |FROM li_v
          |JOIN ord_v ON l_orderkey = o_orderkey
          |JOIN p_cust ON o_custkey = c_custkey
          |JOIN p_nation ON c_nationkey = n_nationkey
          |JOIN p_region ON n_regionkey = r_regionkey
          |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |GROUP BY r_name, n_name""".stripMargin)
    }
    spark.stop()
  }
}

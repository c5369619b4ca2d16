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
    // 0. scan + the bare double revenue expression (the floor)
    t("li_scan_double_sum") {
      li.agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
    }
    // 1. the CAST alone: decimal conversion per row, no aggregation
    t("li_cast_only") {
      li.select(dec4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("r"))
    }
    // 2. cast + global decimal sum
    t("li_scan_decimal_sum") {
      li.agg(sum(dec4(col("l_extendedprice") * (lit(1) - col("l_discount")))))
    }
    // 3a. grouped partial, double sum (hash-agg cost w/o decimal)
    t("li_preagg_double") {
      li.groupBy("l_orderkey")
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    }
    // 3b. grouped partial, decimal sum (the shipped pre-aggregate)
    t("li_preagg_decimal") {
      li.groupBy("l_orderkey")
        .agg(sum(dec4(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev"))
    }
    // 3c. the same as a SORT aggregate over the already-sorted bucket
    // scan (no 1.2M-entry hash table, no UnsafeRow decimal ser/deser
    // per update)
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg.enabled", "true")
    t("li_preagg_decimal_sortagg") {
      li.groupBy("l_orderkey")
        .agg(sum(dec4(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev"))
    }
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg.enabled", "false")
    // 4a. orders side: filter + shuffle cust join (what the plan does)
    def ordCust(bcast: Boolean) = {
      val cust = spark.read.parquet(s"$sfDir/customer.parquet")
        .select(col("c_custkey"), col("c_nationkey"))
      ord.filter(col("o_orderdate") >= "1996-01-01 00:00:00")
        .join(if (bcast) broadcast(cust) else cust,
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
    }
    t("ord_filter_cust_shuffle") { ordCust(bcast = false) }
    // 4b. the same with customer BROADCAST (15M x 16B rows)
    t("ord_filter_cust_bcast") { ordCust(bcast = true) }
    // 6. the full transparent SQL
    spark.read.parquet(s"$wh/li_bkt").createOrReplaceTempView("li_v")
    spark.read.parquet(s"$wh/ord_bkt").createOrReplaceTempView("ord_v")
    spark.read.parquet(s"$sfDir/customer.parquet").createOrReplaceTempView("p_cust")
    spark.read.parquet(s"$sfDir/nation.parquet").createOrReplaceTempView("p_nation")
    spark.read.parquet(s"$sfDir/region.parquet").createOrReplaceTempView("p_region")
    val fullSql =
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM li_v
        |JOIN ord_v ON l_orderkey = o_orderkey
        |JOIN p_cust ON o_custkey = c_custkey
        |JOIN p_nation ON c_nationkey = n_nationkey
        |JOIN p_region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY r_name, n_name""".stripMargin
    t("full_transparent") { spark.sql(fullSql) }
    // (a full-query ReplaceHashWithSortAgg arm OOMed at 48g — the
    // sort-agg variant is only probed on the isolated pre-aggregate)
    spark.stop()
  }
}

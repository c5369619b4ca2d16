package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Times the §2a headline queries at a scaled data dir (see
  * [[ScaleData]]) — median of isolated reps, cache cleared per rep —
  * and prints one JSON line for comparison against DuckDB on the same
  * files (tools/bench_duckdb.py).
  *
  * Usage: runMain graft.ScaleBench [sfDir] [reps]
  */
object ScaleBench {

  /** q6_count_star is the OVERHEAD PROBE: a metadata-only parquet count
    * whose wall-time is almost pure per-job fixed cost, so
    * (query − probe) isolates each query's marginal scan/shuffle work
    * for the cross-engine ratio (judge convention from VERDICT r2). */
  val headline: Seq[String] =
    Seq("q1_agg", "q2_filter_between", "q9_orderby_limit", "q12_join_multi",
      "q6_count_star")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      // shuffle width defaults to core count; big-shuffle shapes (q12's
      // 600M-row join at sf100) can override — more partitions = less
      // per-task build memory and spill (SPARK_GRAFT_SHUFFLE_PARTITIONS)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "true"))
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.eventLog.enabled",
        sys.env.getOrElse("SPARK_GRAFT_EVENTLOG", "false"))
      .config("spark.eventLog.dir", "/tmp/spark-events")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warm
    spark.read.parquet(s"$sfDir/nation.parquet").count() // parquet path warm
    // noop sink, NOT count(): count() lets ColumnPruning drop projected
    // and aggregated expressions out of the timed plan (the round-15
    // Q12Arms discovery — r14's q12 ledger measured a pruned query
    // while DuckDB computed the full one). The noop write materializes
    // every output row in full with no driver transfer; the DuckDB
    // pair (tools/bench_duckdb.py) matches it with a full-query arrow
    // fetch. Round 16: ALL ledger timings route through this sink.
    def sink(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def timed(name: String)(run: => Unit): (String, Double) = {
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        // Measure the query, not the previous rep's GC debt: a heavy
        // rep leaves the old gen full of promoted-but-dead Tungsten
        // pages, and without a full collection the NEXT rep pays for
        // them with 5-30x inflated GC time (measured: identical q12
        // reps at 20s/43s/90s without this, 19-21s with it).
        System.gc()
        val t0 = System.nanoTime()
        run
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> ts(ts.size / 2)
    }
    // SPARK_GRAFT_ONLY_BUCKETED=1: skip the headline loop but keep the
    // overhead probe — the bucketed q12's marginal must subtract a
    // probe measured in the SAME window.
    // SPARK_GRAFT_HEADLINE=q1_agg,q9_orderby_limit: headline subset
    // (a targeted re-measure shouldn't pay for the heavy join arms);
    // the probe rides along unconditionally for the marginal baseline.
    val headlineRun =
      if (sys.env.contains("SPARK_GRAFT_ONLY_BUCKETED")) Seq("q6_count_star")
      else sys.env.get("SPARK_GRAFT_HEADLINE") match {
        case Some(sel) =>
          (sel.split(",").map(_.trim).filter(_.nonEmpty).toSeq :+ "q6_count_star").distinct
        case None => headline
      }
    val headlineResults = headlineRun.map { name =>
      val q = SparkEntry.queries(name)
      timed(name)(sink(q(spark, sfDir)))
    }
    // q1_agg_double rides with the headline loop, not the bucketed-only
    // mode: ONLY_BUCKETED promises "just the probe", and full timed reps
    // (with a System.gc each) of an unrequested query are minutes of
    // unadvertised runtime at sf100.
    var results =
      if (sys.env.contains("SPARK_GRAFT_ONLY_BUCKETED")) headlineResults
      else headlineResults :+ timed("q1_agg_double") {
      // q1 with PLAIN double sums: quantifies the exact-decimal
      // determinism tax the oracle-checked q1 pays (graft routes double
      // aggregation through DECIMAL so results hash-match DuckDB
      // bit-for-bit across partitionings — see Det scaladoc)
      sink(spark.read.parquet(s"$sfDir/lineitem.parquet")
        .filter(col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), sum("l_extendedprice"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          avg("l_quantity"), count(lit(1))))
    }
    // q20 over orders BUCKETED BY ITS WINDOW KEY (o_custkey): the
    // partition-by distribution is satisfied by the bucketing, so the
    // 150M-row exchange under WindowExec disappears and only the
    // per-bucket sort remains — the same pay-once-layout answer as
    // bucketed q12, for window shapes instead of joins. Env-gated: the
    // clustering write is a layout decision, not a per-run cost.
    val q20Results =
      if (!sys.env.contains("SPARK_GRAFT_Q20_BUCKETED")) Nil
      else {
        val buckets = sys.env.getOrElse("SPARK_GRAFT_Q20_BUCKETS", "64").toInt
        val build =
          if (sys.env.contains("SPARK_GRAFT_REBUCKET")) {
            val t0 = System.nanoTime()
            graft.sources.Bucketing.writeBucketed(
              spark.read.parquet(s"$sfDir/orders.parquet"), "ord_cust_bkt",
              "o_custkey", buckets, columns = Seq("o_orderkey", "o_totalprice"))
            (System.nanoTime() - t0) / 1e9
          } else graft.sources.Bucketing.ensureBucketed(
            spark, spark.read.parquet(s"$sfDir/orders.parquet"),
            "ord_cust_bkt", "o_custkey", buckets,
            columns = Seq("o_orderkey", "o_totalprice"))
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        def q20b() = spark.table("ord_cust_bkt")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            org.apache.spark.sql.functions.row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
          .orderBy("o_custkey", "rn")
        Seq("q20_bucketed_build" -> build,
          "q20_window_rank_bucketed" -> timed("q20b")(sink(q20b()))._2)
      }
    results = results ++ q20Results
    // q12 on BUCKETED fact tables: pay the clustering write once, then
    // the lineitem⋈orders join runs with no exchange on either side —
    // the 100 TB answer to repeated joins on the same key (the shuffle
    // is the entire gap to a single-node engine at this sf).
    // SPARK_GRAFT_SKIP_BUCKETED=1 skips the clustering write (it sorts
    // the whole fact table — at sf100 that's a disk-spill budget call).
    if (sys.env.contains("SPARK_GRAFT_SKIP_BUCKETED")) {
      val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      println(s"""{"bench":"scale","sf":"$sfDir","reps":$reps,"graft_sec":$qs}""")
      spark.stop()
      return
    }
    // Spill-lean clustering write: project to the join-relevant columns
    // (the workload family this layout serves) and size the bucket
    // count so each task's sort fits executor memory — SPARK_GRAFT_
    // BUCKETS, default 32; 128 at sf100 keeps per-task sorts ~4.7M rows.
    val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "32").toInt
    // The sorted-bucket join IS a streaming merge — force SMJ here even
    // when the headline methodology prefers SHJ for unbucketed shapes
    // (the exchange-free sorted merge is the layout's whole point).
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    // Reuse an already-clustered layout when its files survive from a
    // previous session (the in-memory catalog forgets bucket specs on
    // JVM exit; the files don't) — pay-once layout, query-many.
    val t0 = System.nanoTime()
    val reused = !sys.env.contains("SPARK_GRAFT_REBUCKET") &&
      graft.sources.Bucketing.registerExisting(spark, "li_bkt", "l_orderkey", buckets) &&
      graft.sources.Bucketing.registerExisting(spark, "ord_bkt", "o_orderkey", buckets)
    if (!reused) {
      graft.sources.Bucketing.writeBucketed(
        spark.read.parquet(s"$sfDir/lineitem.parquet"), "li_bkt", "l_orderkey", buckets,
        columns = Seq("l_extendedprice", "l_discount"))
      graft.sources.Bucketing.writeBucketed(
        spark.read.parquet(s"$sfDir/orders.parquet"), "ord_bkt", "o_orderkey", buckets,
        columns = Seq("o_orderdate", "o_custkey"))
    }
    val buildSec = if (reused) 0.0 else (System.nanoTime() - t0) / 1e9
    // The at-scale q12 plan, three structural moves on top of the
    // bucketed layout (same result set — every move is a rewrite an
    // agg-pushdown/join-reorder optimizer could make):
    //  1. JOIN ORDER: customer is fact-sized at 100x (1/10 of orders),
    //     so it joins into orders via orders-sized shuffles — never
    //     broadcast (a multi-GB single-threaded hash build per rep),
    //     and lineitem — the 100 TB side — NEVER shuffles.
    //  2. AGG PUSHDOWN: revenue pre-aggregates by l_orderkey INSIDE
    //     the buckets (hash-partitioned by the key -> partial+final
    //     with no exchange), 4x'ing down the merge's left input.
    //  3. LATE STRINGS: only a 4-byte nationkey crosses the shuffles
    //     and the merge; names attach to the final 25-row aggregate.
    def q12Bucketed(): DataFrame = {
      import graft.queries.Det.dec4
      val revByOrder = spark.table("li_bkt")
        .groupBy("l_orderkey")
        .agg(sum(dec4(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev"))
      val ordNation = spark.table("ord_bkt")
        .filter(col("o_orderdate") >= "1996-01-01 00:00:00")
        .join(spark.read.parquet(s"$sfDir/customer.parquet")
            .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
      val revByNation = revByOrder
        .join(ordNation, col("l_orderkey") === col("o_orderkey"))
        .groupBy("c_nationkey")
        .agg(sum(col("rev")).as("rev"))
      revByNation
        .join(broadcast(spark.read.parquet(s"$sfDir/nation.parquet")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(spark.read.parquet(s"$sfDir/region.parquet")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(col("rev")).cast("double").as("revenue"))
    }
    if (sys.env.contains("SPARK_GRAFT_DIAG")) {
      def t(label: String)(run: => Unit): Unit = {
        val s0 = System.nanoTime()
        run
        val rt = Runtime.getRuntime
        System.gc()
        val live = (rt.totalMemory() - rt.freeMemory()) / 1e9
        println(f"[diag] $label: ${(System.nanoTime() - s0) / 1e9}%.2fs (live-after-gc $live%.1fGB)")
      }
      def q12Double(): DataFrame = {
        val revByOrder = spark.table("li_bkt")
          .groupBy("l_orderkey")
          .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        val ordNation = spark.table("ord_bkt")
          .filter(col("o_orderdate") >= "1996-01-01 00:00:00")
          .join(spark.read.parquet(s"$sfDir/customer.parquet")
              .select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("c_nationkey"))
        revByOrder.join(ordNation, col("l_orderkey") === col("o_orderkey"))
          .groupBy("c_nationkey").agg(sum(col("rev")).as("rev"))
      }
      t("revByOrder only")(sink(spark.table("li_bkt").groupBy("l_orderkey")
        .agg(sum(graft.queries.Det.dec4(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev"))))
      t("q12 double-sums")(sink(q12Double()))
      (1 to 4).foreach { i =>
        spark.catalog.clearCache()
        t(s"q12Bucketed rep$i")(sink(q12Bucketed()))
      }
    }
    val bts = (1 to reps).map { _ =>
      spark.catalog.clearCache()
      System.gc() // see timed()
      val s0 = System.nanoTime(); sink(q12Bucketed()); (System.nanoTime() - s0) / 1e9
    }.sorted

    // The TRANSPARENT arm (round 14): the ORIGINAL q12 SQL, verbatim,
    // over plain parquet PATHS of the bucketed layouts — no catalog
    // table, no hand moves. BucketLayoutRule re-attaches the written
    // spec from the sidecar; EagerAggregationRule pushes the revenue
    // partial below the join (the hand arm's move #2, now automatic).
    // What a user who just writes SQL actually gets.
    def q12Transparent(): DataFrame = {
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      spark.read.parquet(s"$wh/li_bkt").createOrReplaceTempView("li_bkt_v")
      spark.read.parquet(s"$wh/ord_bkt").createOrReplaceTempView("ord_bkt_v")
      spark.read.parquet(s"$sfDir/customer.parquet").createOrReplaceTempView("sb_cust_v")
      spark.read.parquet(s"$sfDir/nation.parquet").createOrReplaceTempView("sb_nation_v")
      spark.read.parquet(s"$sfDir/region.parquet").createOrReplaceTempView("sb_region_v")
      spark.sql(
        """SELECT r_name, n_name,
          |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
          |FROM li_bkt_v
          |JOIN ord_bkt_v ON l_orderkey = o_orderkey
          |JOIN sb_cust_v ON o_custkey = c_custkey
          |JOIN sb_nation_v ON c_nationkey = n_nationkey
          |JOIN sb_region_v ON n_regionkey = r_regionkey
          |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)
    }
    val tts = (1 to reps).map { _ =>
      spark.catalog.clearCache()
      System.gc()
      val s0 = System.nanoTime(); sink(q12Transparent()); (System.nanoTime() - s0) / 1e9
    }.sorted
    val qs = (results ++ Seq(
      "q12_join_multi_bucketed" -> bts(bts.size / 2),
      "q12_join_multi_transparent" -> tts(tts.size / 2)))
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val repsArr = bts.mkString("[", ",", "]")
    val trepsArr = tts.mkString("[", ",", "]")
    println(s"""{"bench":"scale","sf":"$sfDir","reps":$reps,"bucket_build_sec":$buildSec,"graft_sec":$qs,"q12_bucketed_reps_sorted":$repsArr,"q12_transparent_reps_sorted":$trepsArr}""")
    spark.stop()
  }
}

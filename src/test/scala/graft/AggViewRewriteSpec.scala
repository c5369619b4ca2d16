package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.GraftSession
import graft.plans.AggViewRewriteRule
import graft.sources.AggView

/** Transparent materialized-view rewriting (plans/AggViewRewriteRule):
  * plain `spark.sql` aggregates over a registered/marked table serve
  * from the (group, value, freq) view. The contract under test:
  *
  *   - recognized shapes REWRITE (the executed plan scans the view
  *     path, not the base) and the answers equal the base-scan
  *     answers exactly — count-distinct, count(*), count(v), min,
  *     max, percentile; exact-group and roll-up groupings;
  *   - unrecognized or unsafe shapes DON'T (filters, other columns,
  *     expressions in the grouping) — plan untouched, answers right;
  *   - the staleness gate refuses a view whose file set no longer
  *     matches (append after build ⇒ no rewrite until refresh);
  *   - `_graft_views` marker discovery works in a FRESH session with
  *     no register call.
  */
class AggViewRewriteSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = GraftSession.local(
    cores = 8, appName = "graft-aggview-rewrite-test")
  private val dir = "/root/testdata/sf0.01"

  private def scratch(tag: String) = s"target/scratch/test/aggview-rw/$tag"

  private lazy val li = graft.engine.Tables.load(spark, dir, "lineitem")

  /** Does the OPTIMIZED plan read from `path`? */
  private def scansPath(df: DataFrame, path: String): Boolean = {
    val needle = new java.io.File(path).getAbsolutePath
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.exists(_.toString.contains(needle))
    }.exists(identity)
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private lazy val basics: (String, String) = {
    val base = scratch("basics/base")
    li.limit(8000).repartition(3).write.mode("overwrite").parquet(base)
    val view = scratch("basics/view")
    AggView.build(spark, base, view, Seq("l_returnflag"), "l_suppkey")
    AggViewRewriteRule.registerView(base, view)
    (base, view)
  }

  test("recognized shapes rewrite onto the view and stay exact") {
    val (base, view) = basics
    spark.read.parquet(base).createOrReplaceTempView("rw_t")
    val q =
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS nd, COUNT(*) AS n,
        |  COUNT(l_suppkey) AS nv, MIN(l_suppkey) AS lo, MAX(l_suppkey) AS hi,
        |  PERCENTILE(l_suppkey, 0.5) AS p50
        |FROM rw_t GROUP BY l_returnflag""".stripMargin
    val served = spark.sql(q)
    assert(scansPath(served, view), "plan must read the view")
    assert(!scansPath(served, base), "plan must not read the base")
    // ground truth from a session WITHOUT the rule's registration:
    // same SQL, view unregistered root (a copy of the base)
    val truthBase = scratch("basics/truth")
    spark.read.parquet(base).write.mode("overwrite").parquet(truthBase)
    spark.read.parquet(truthBase).createOrReplaceTempView("rw_truth")
    val truth = spark.sql(q.replace("rw_t", "rw_truth"))
    assert(!scansPath(truth, view))
    assert(rows(served) == rows(truth))
  }

  test("roll-up grouping (subset of view groups) rewrites too") {
    val (base, view) = basics
    spark.read.parquet(base).createOrReplaceTempView("rw_t2")
    val served = spark.sql(
      "SELECT COUNT(DISTINCT l_suppkey) AS nd, COUNT(*) AS n FROM rw_t2")
    assert(scansPath(served, view), "global roll-up must serve from the view")
    val truth = spark.read.parquet(base)
      .agg(countDistinct(col("l_suppkey")).as("nd"), count(lit(1)).as("n"))
    assert(rows(served) == rows(truth))
  }

  test("unsafe or unrecognized shapes leave the plan untouched") {
    val (base, view) = basics
    spark.read.parquet(base).createOrReplaceTempView("rw_t3")
    // a WHERE clause changes which rows aggregate — must NOT rewrite
    val filtered = spark.sql(
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS nd FROM rw_t3
        |WHERE l_quantity > 25 GROUP BY l_returnflag""".stripMargin)
    assert(!scansPath(filtered, view))
    val truthF = spark.read.parquet(base).filter(col("l_quantity") > 25)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("nd"))
    assert(rows(filtered) == rows(truthF))
    // an aggregate on a DIFFERENT column — no view covers it
    val other = spark.sql(
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd FROM rw_t3
        |GROUP BY l_returnflag""".stripMargin)
    assert(!scansPath(other, view))
    // AVG over a DOUBLE column refuses (order-dependent float sums);
    // integral AVG serves — pinned in its own test below
    val avged = spark.sql(
      """SELECT l_returnflag, AVG(l_extendedprice) AS a FROM rw_t3
        |GROUP BY l_returnflag""".stripMargin)
    assert(!scansPath(avged, view))
    // computed grouping key
    val computed = spark.sql(
      """SELECT l_returnflag || 'x' AS g, COUNT(DISTINCT l_suppkey) AS nd
        |FROM rw_t3 GROUP BY l_returnflag || 'x'""".stripMargin)
    assert(!scansPath(computed, view))
  }

  test("staleness gate: an appended file disables the rewrite until refresh") {
    val base = scratch("stale/base")
    li.limit(4000).repartition(2).write.mode("overwrite").parquet(base)
    val view = scratch("stale/view")
    AggView.build(spark, base, view, Seq("l_returnflag"), "l_suppkey")
    AggViewRewriteRule.registerView(base, view)
    spark.read.parquet(base).createOrReplaceTempView("rw_s")
    val q = "SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS nd " +
      "FROM rw_s GROUP BY l_returnflag"
    assert(scansPath(spark.sql(q), view), "fresh view must serve")

    li.limit(2000).repartition(1).write.mode("append").parquet(base)
    spark.read.parquet(base).createOrReplaceTempView("rw_s2")
    val q2 = q.replace("rw_s", "rw_s2")
    val afterAppend = spark.sql(q2)
    assert(!scansPath(afterAppend, view),
      "stale view (file-set mismatch) must NOT serve")
    val truth = spark.read.parquet(base).groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("nd"))
    assert(rows(afterAppend) == rows(truth))

    AggView.refresh(spark, base, view)
    val afterRefresh = spark.sql(q2)
    assert(scansPath(afterRefresh, view), "refreshed view must serve again")
    assert(rows(afterRefresh) == rows(truth))
  }

  test("multi-value aggregates join per-column views; integral SUM is exact") {
    val base = scratch("multi/base")
    li.limit(8000).repartition(3).write.mode("overwrite").parquet(base)
    val viewS = scratch("multi/view_supp")
    val viewP = scratch("multi/view_part")
    val viewE = scratch("multi/view_price")
    AggView.build(spark, base, viewS, Seq("l_returnflag"), "l_suppkey")
    AggView.build(spark, base, viewP, Seq("l_returnflag"), "l_partkey")
    AggView.build(spark, base, viewE, Seq("l_returnflag"), "l_extendedprice")
    AggViewRewriteRule.registerView(base, viewS)
    AggViewRewriteRule.registerView(base, viewP)
    AggViewRewriteRule.registerView(base, viewE)
    spark.read.parquet(base).createOrReplaceTempView("rw_multi")

    // q16's literal shape: two distinct columns + COUNT(*), plus an
    // integral SUM — one partial per view, joined on the group key
    val q =
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows,
        |  SUM(l_suppkey) AS sum_supp
        |FROM rw_multi GROUP BY l_returnflag""".stripMargin
    val served = spark.sql(q)
    assert(scansPath(served, viewS) && scansPath(served, viewP),
      "both views must serve")
    assert(!scansPath(served, base))
    val truthBase = scratch("multi/truth")
    spark.read.parquet(base).write.mode("overwrite").parquet(truthBase)
    spark.read.parquet(truthBase).createOrReplaceTempView("rw_multi_truth")
    val truth = spark.sql(q.replace("rw_multi", "rw_multi_truth"))
    assert(rows(served) == rows(truth))

    // global (no GROUP BY) multi-value: 1x1 cross join of partials
    val global = spark.sql(
      """SELECT COUNT(DISTINCT l_partkey) AS a, COUNT(DISTINCT l_suppkey) AS b,
        |  SUM(l_suppkey) AS s FROM rw_multi""".stripMargin)
    assert(scansPath(global, viewS) && scansPath(global, viewP))
    val globalTruth = spark.sql(
      """SELECT COUNT(DISTINCT l_partkey) AS a, COUNT(DISTINCT l_suppkey) AS b,
        |  SUM(l_suppkey) AS s FROM rw_multi_truth""".stripMargin)
    assert(rows(global) == rows(globalTruth))

    // SUM over a DECIMAL column refuses even with its view present
    // (decimal precision promotion differs between Σv and Σv·freq)
    val decSum = spark.sql(
      "SELECT l_returnflag, SUM(l_extendedprice) AS s FROM rw_multi " +
      "GROUP BY l_returnflag")
    assert(!scansPath(decSum, viewE))

    // a value column with NO registered view refuses the whole query
    // (never serve half the aggregates)
    val mixed = spark.sql(
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS a,
        |  COUNT(DISTINCT l_quantity) AS b
        |FROM rw_multi GROUP BY l_returnflag""".stripMargin)
    assert(!scansPath(mixed, viewS))
  }

  test("null group keys survive the multi-view join (null-safe equality)") {
    val base = scratch("nullg/base")
    li.limit(6000)
      .withColumn("g", when(col("l_linenumber") === 1, lit(null))
        .otherwise(col("l_returnflag")).cast("string"))
      .select("g", "l_suppkey", "l_partkey")
      .repartition(2).write.mode("overwrite").parquet(base)
    val viewS = scratch("nullg/view_supp")
    val viewP = scratch("nullg/view_part")
    AggView.build(spark, base, viewS, Seq("g"), "l_suppkey")
    AggView.build(spark, base, viewP, Seq("g"), "l_partkey")
    AggViewRewriteRule.registerView(base, viewS)
    AggViewRewriteRule.registerView(base, viewP)
    spark.read.parquet(base).createOrReplaceTempView("rw_ng")
    val q =
      """SELECT g, COUNT(DISTINCT l_suppkey) AS a,
        |  COUNT(DISTINCT l_partkey) AS b, COUNT(*) AS n
        |FROM rw_ng GROUP BY g""".stripMargin
    val served = spark.sql(q)
    assert(scansPath(served, viewS) && scansPath(served, viewP))
    val truthBase = scratch("nullg/truth")
    spark.read.parquet(base).write.mode("overwrite").parquet(truthBase)
    spark.read.parquet(truthBase).createOrReplaceTempView("rw_ng_truth")
    val truth = spark.sql(q.replace("rw_ng", "rw_ng_truth"))
    assert(rows(served).exists(_.startsWith("[null,")),
      "the null group must exist for this case to test anything")
    assert(rows(served) == rows(truth))
  }

  test("value-less shapes serve from any view: grouped COUNT(*) and DISTINCT g") {
    val (base, view) = basics
    spark.read.parquet(base).createOrReplaceTempView("rw_vl")
    val counted = spark.sql(
      "SELECT l_returnflag, COUNT(*) AS n FROM rw_vl GROUP BY l_returnflag")
    assert(scansPath(counted, view), "grouped COUNT(*) must serve")
    val truthN = spark.read.parquet(base)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(rows(counted) == rows(truthN))

    val dist = spark.sql("SELECT DISTINCT l_returnflag FROM rw_vl")
    assert(scansPath(dist, view), "SELECT DISTINCT g must serve")
    val truthD = spark.read.parquet(base).select("l_returnflag").distinct()
    assert(rows(dist) == rows(truthD))
  }

  test("a WHERE covered by (group cols ∪ value col) pushes through the rewrite") {
    val (base, view) = basics
    spark.read.parquet(base).createOrReplaceTempView("rw_f")
    val truthBase = scratch("filter/truth")
    spark.read.parquet(base).write.mode("overwrite").parquet(truthBase)
    spark.read.parquet(truthBase).createOrReplaceTempView("rw_f_truth")
    def both(q: String): (DataFrame, DataFrame) =
      (spark.sql(q), spark.sql(q.replace("rw_f", "rw_f_truth")))

    // filter on the VALUE column: view rows preserve it exactly
    val (v1, t1) = both(
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS nd, COUNT(*) AS n,
        |  MIN(l_suppkey) AS lo, PERCENTILE(l_suppkey, 0.5) AS p50,
        |  SUM(l_suppkey) AS s
        |FROM rw_f WHERE l_suppkey > 50 GROUP BY l_returnflag""".stripMargin)
    assert(scansPath(v1, view), "value-column filter must push through")
    assert(rows(v1) == rows(t1))

    // filter on a GROUP column
    val (v2, t2) = both(
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS nd
        |FROM rw_f WHERE l_returnflag <> 'A' GROUP BY l_returnflag""".stripMargin)
    assert(scansPath(v2, view), "group-column filter must push through")
    assert(rows(v2) == rows(t2))

    // compound covered filter, global aggregate
    val (v3, t3) = both(
      """SELECT COUNT(DISTINCT l_suppkey) AS nd, COUNT(*) AS n
        |FROM rw_f WHERE l_returnflag = 'N' AND l_suppkey % 2 = 0""".stripMargin)
    assert(scansPath(v3, view), "compound covered filter must push through")
    assert(rows(v3) == rows(t3))

    // non-deterministic predicate refuses (Spark folds the vacuous
    // rand() < 2.0 away itself, so probe with a selective one)
    val nd = spark.sql(
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS nd
        |FROM rw_f WHERE rand() < 0.5 GROUP BY l_returnflag""".stripMargin)
    assert(!scansPath(nd, view), "non-deterministic filter must refuse")
  }

  test("multi-view: a value-column filter refuses when another view serves too") {
    val base = scratch("fmulti/base")
    li.limit(6000).repartition(2).write.mode("overwrite").parquet(base)
    val viewS = scratch("fmulti/view_supp")
    val viewP = scratch("fmulti/view_part")
    AggView.build(spark, base, viewS, Seq("l_returnflag"), "l_suppkey")
    AggView.build(spark, base, viewP, Seq("l_returnflag"), "l_partkey")
    AggViewRewriteRule.registerView(base, viewS)
    AggViewRewriteRule.registerView(base, viewP)
    spark.read.parquet(base).createOrReplaceTempView("rw_fm")

    // l_suppkey is NOT covered by the partkey view → whole query refuses
    val refused = spark.sql(
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS a,
        |  COUNT(DISTINCT l_partkey) AS b
        |FROM rw_fm WHERE l_suppkey > 50 GROUP BY l_returnflag""".stripMargin)
    assert(!scansPath(refused, viewS) && !scansPath(refused, viewP))

    // a GROUP-column filter is covered by both views → serves
    val served = spark.sql(
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS a,
        |  COUNT(DISTINCT l_partkey) AS b
        |FROM rw_fm WHERE l_returnflag <> 'A' GROUP BY l_returnflag""".stripMargin)
    assert(scansPath(served, viewS) && scansPath(served, viewP))
    val truthBase = scratch("fmulti/truth")
    spark.read.parquet(base).write.mode("overwrite").parquet(truthBase)
    spark.read.parquet(truthBase).createOrReplaceTempView("rw_fm_truth")
    val truth = spark.sql(
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS a,
        |  COUNT(DISTINCT l_partkey) AS b
        |FROM rw_fm_truth WHERE l_returnflag <> 'A' GROUP BY l_returnflag""".stripMargin)
    assert(rows(served) == rows(truth))
  }

  test("legacy-mode SUM wraparound is bit-identical between scan and view") {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val base = scratch("wrap/base")
      import spark.implicits._
      Seq(
        ("a", Long.MaxValue), ("a", Long.MaxValue), ("a", Long.MaxValue),
        ("a", 100L), ("a", Long.MaxValue), ("b", -5L), ("b", Long.MinValue),
        ("b", Long.MinValue)).toDF("g", "v")
        .repartition(2).write.mode("overwrite").parquet(base)
      val view = scratch("wrap/view")
      AggView.build(spark, base, view, Seq("g"), "v")
      AggViewRewriteRule.registerView(base, view)
      spark.read.parquet(base).createOrReplaceTempView("rw_w")
      val served = spark.sql("SELECT g, SUM(v) AS s FROM rw_w GROUP BY g")
      assert(scansPath(served, view), "legacy SUM must serve")
      val truthBase = scratch("wrap/truth")
      spark.read.parquet(base).write.mode("overwrite").parquet(truthBase)
      spark.read.parquet(truthBase).createOrReplaceTempView("rw_w_truth")
      val truth = spark.sql("SELECT g, SUM(v) AS s FROM rw_w_truth GROUP BY g")
      // Σv over rows wraps mod 2^64; Σv·freq over view rows wraps to
      // the SAME residue — two's-complement arithmetic is a ring
      // homomorphism, so the wrapped totals are bit-identical:
      // a: 4·(2^63−1)+100 ≡ 96, b: −5+2·(−2^63) ≡ −5 (mod 2^64)
      assert(rows(served) == rows(truth))
      assert(rows(served) == Seq("[a,96]", "[b,-5]"),
        "wraparound must actually occur and match the ring argument")
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("integral AVG near 2^63 serves without wrapping (decimal numerator)") {
    // the round-12 ADVICE item: a LongType Σ v·freq numerator wraps
    // past 2^63 (silent sign-flip in LEGACY, throw under ANSI) while
    // vanilla AVG never does — it sums doubles. The decimal numerator
    // stays exact: group a's products hit exactly 2^64 (4·2^62) and
    // group b's 3·2^62 crosses 2^63 — both former wrap/throw cases.
    val base = scratch("avgbig/base")
    import spark.implicits._
    val q = 1L << 62
    Seq(("a", q), ("a", q), ("a", q), ("a", q),
        ("b", q), ("b", q), ("b", q),
        ("c", 1L), ("c", 2L)).toDF("g", "v")
      .repartition(2).write.mode("overwrite").parquet(base)
    val view = scratch("avgbig/view")
    AggView.build(spark, base, view, Seq("g"), "v")
    AggViewRewriteRule.registerView(base, view)
    spark.read.parquet(base).createOrReplaceTempView("rw_avgbig")
    val served = spark.sql("SELECT g, AVG(v) AS a FROM rw_avgbig GROUP BY g")
    assert(scansPath(served, view), "big-value integral AVG must serve")
    val truth = spark.read.parquet(base).groupBy("g").agg(avg(col("v")).as("a"))
    assert(rows(served) == rows(truth),
      "a wrapped numerator would sign-flip groups a and b")
    assert(served.filter(col("g") === "a").first.getDouble(1) == q.toDouble)
  }

  test("view rewrite wins over zone-map pruning on the same table") {
    // ZoneMapPruneRule replaces a filtered relation's file index with
    // the pruned subset; if it ran FIRST, the view gate's file-set
    // equality would fail on exactly the filtered queries the view
    // targets. GraftExtensions injects the view rewrite before the
    // zone rule — this pins that a table registered with BOTH, under a
    // PRUNING-EFFECTIVE filter, still serves from the view.
    import graft.plans.ZoneMapPruneRule
    import graft.sources.{MicroBlockIndex, MicroBlockWriter}
    val base = scratch("zm/base")
    // cluster by the value column so the range filter would prune files
    MicroBlockWriter.write(li.limit(8000), base, "l_suppkey", 8)
    val stats = MicroBlockIndex.build(spark, base, "lineitem").collect().toSeq
    ZoneMapPruneRule.register(base, stats)
    val view = scratch("zm/view")
    AggView.build(spark, base, view, Seq("l_returnflag"), "l_suppkey")
    AggViewRewriteRule.registerView(base, view)
    try {
      spark.read.parquet(base).createOrReplaceTempView("rw_zm")
      // sanity: the zone rule CAN prune this filter when the view
      // rewrite refuses (AVG is not a served shape)
      val pruned = spark.sql(
        """SELECT l_returnflag, AVG(l_quantity) AS a FROM rw_zm
          |WHERE l_suppkey <= 20 GROUP BY l_returnflag""".stripMargin)
      val scannedFiles = pruned.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.inputFiles.length
      }.sum
      val totalFiles = spark.read.parquet(base).inputFiles.length
      assert(scannedFiles < totalFiles,
        s"zone rule should prune ($scannedFiles vs $totalFiles) for this case to test anything")
      // the served shape under the SAME pruning-effective filter must
      // go to the VIEW, not the pruned scan
      val served = spark.sql(
        """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS nd, COUNT(*) AS n
          |FROM rw_zm WHERE l_suppkey <= 20 GROUP BY l_returnflag""".stripMargin)
      assert(scansPath(served, view), "view rewrite must win over zone pruning")
      val truthBase = scratch("zm/truth")
      spark.read.parquet(base).write.mode("overwrite").parquet(truthBase)
      spark.read.parquet(truthBase).createOrReplaceTempView("rw_zm_truth")
      val truth = spark.sql(
        """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS nd, COUNT(*) AS n
          |FROM rw_zm_truth WHERE l_suppkey <= 20 GROUP BY l_returnflag""".stripMargin)
      assert(rows(served) == rows(truth))
    } finally ZoneMapPruneRule.unregister(base)
  }

  test("view stays exact across streaming ingest waves via delta-only refresh") {
    // the operational composition: StreamIngest lands micro-batches
    // (data files + _SUCCESS/_graft_index sidecars), the view's
    // staleness gate refuses until refresh, refresh reads ONLY the new
    // wave's files, and the transparent serve resumes — underscore
    // sidecars must not poison the file-set equality on either side
    import graft.streaming.StreamIngest
    val out = scratch("ingest/table")
    val rmDir = new java.io.File(out)
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(rm)); x.delete()
    }
    rm(rmDir)
    new java.io.File(out).mkdirs()
    val ev = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val ingest = new StreamIngest(spark, out, "ev_view", "ts", 2)
    ingest.ingestBatch(ev.limit(2000), 0)

    val view = scratch("ingest/view")
    AggView.build(spark, out, view, Seq("event_type"), "user_id")
    AggView.writeMarker(out, Seq(view))
    val q = "SELECT event_type, COUNT(DISTINCT user_id) AS nd, " +
      "COUNT(*) AS n FROM %s GROUP BY event_type"
    def truth(): Seq[String] = {
      val t = scratch("ingest/truth")
      spark.read.parquet(out).write.mode("overwrite").parquet(t)
      spark.read.parquet(t).createOrReplaceTempView("rw_ing_truth")
      rows(spark.sql(q.format("rw_ing_truth")))
    }
    spark.read.parquet(out).createOrReplaceTempView("rw_ing1")
    val s1 = spark.sql(q.format("rw_ing1"))
    assert(scansPath(s1, view), "wave-1 view must serve (marker discovery)")
    assert(rows(s1) == truth())

    ingest.ingestBatch(ev.limit(3000).filter(col("event_id") >= 2000), 1)
    spark.read.parquet(out).createOrReplaceTempView("rw_ing2")
    val s2 = spark.sql(q.format("rw_ing2"))
    assert(!scansPath(s2, view), "stale view must refuse after the new wave")
    assert(rows(s2) == truth())

    assert(AggView.refresh(spark, out, view), "refresh must see new files")
    val s3 = spark.sql(q.format("rw_ing2"))
    assert(scansPath(s3, view), "refreshed view must serve again")
    assert(rows(s3) == truth())
  }

  test("multi-group-column views serve exact groupings and roll-ups") {
    val base = scratch("mgrp/base")
    li.limit(6000).repartition(2).write.mode("overwrite").parquet(base)
    val view = scratch("mgrp/view")
    AggView.build(spark, base, view,
      Seq("l_returnflag", "l_linestatus"), "l_suppkey")
    AggViewRewriteRule.registerView(base, view)
    spark.read.parquet(base).createOrReplaceTempView("rw_mg")
    val truthBase = scratch("mgrp/truth")
    spark.read.parquet(base).write.mode("overwrite").parquet(truthBase)
    spark.read.parquet(truthBase).createOrReplaceTempView("rw_mg_truth")
    def both(q: String): (DataFrame, DataFrame) =
      (spark.sql(q), spark.sql(q.replace("rw_mg ", "rw_mg_truth ")))

    // exact two-column grouping
    val (e1, t1) = both(
      """SELECT l_returnflag, l_linestatus, COUNT(DISTINCT l_suppkey) AS nd,
        |  COUNT(*) AS n FROM rw_mg GROUP BY l_returnflag, l_linestatus""".stripMargin)
    assert(scansPath(e1, view), "exact two-column grouping must serve")
    assert(rows(e1) == rows(t1))

    // roll-up to ONE of the two group columns
    val (e2, t2) = both(
      """SELECT l_linestatus, COUNT(DISTINCT l_suppkey) AS nd, COUNT(*) AS n
        |FROM rw_mg GROUP BY l_linestatus""".stripMargin)
    assert(scansPath(e2, view), "single-column roll-up must serve")
    assert(rows(e2) == rows(t2))

    // filter on the OTHER group column + roll-up: covered, pushes
    val (e3, t3) = both(
      """SELECT l_linestatus, COUNT(DISTINCT l_suppkey) AS nd
        |FROM rw_mg WHERE l_returnflag <> 'A' GROUP BY l_linestatus""".stripMargin)
    assert(scansPath(e3, view),
      "filter on a non-queried group column must push through")
    assert(rows(e3) == rows(t3))

    // grouping by a column the view does NOT group by refuses
    val refused = spark.sql(
      """SELECT l_shipdate, COUNT(DISTINCT l_suppkey) AS nd
        |FROM rw_mg GROUP BY l_shipdate""".stripMargin)
    assert(!scansPath(refused, view))
  }

  test("catalog tables (saveAsTable) rewrite like path tables") {
    // production tables are catalog-managed; parquet reads resolve
    // through the same V1 LogicalRelation, so registering the table
    // LOCATION serves plain SQL over the table NAME
    li.limit(5000).repartition(2).write.mode("overwrite")
      .saveAsTable("rw_cat_t")
    val loc = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("rw_cat_t"))
      .location.getPath
    val view = scratch("cat/view")
    AggView.build(spark, loc, view, Seq("l_returnflag"), "l_suppkey")
    AggViewRewriteRule.registerView(loc, view)
    try {
      val served = spark.sql(
        """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS nd, COUNT(*) AS n
          |FROM rw_cat_t GROUP BY l_returnflag""".stripMargin)
      assert(scansPath(served, view), "catalog table must serve from the view")
      val truth = spark.table("rw_cat_t").groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("nd"), count(lit(1)).as("n"))
      // truth would itself rewrite — compare against a detached copy
      val truthBase = scratch("cat/truth")
      spark.table("rw_cat_t").write.mode("overwrite").parquet(truthBase)
      val truthDf = spark.read.parquet(truthBase).groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("nd"), count(lit(1)).as("n"))
      assert(rows(served) == rows(truthDf))
    } finally {
      AggViewRewriteRule.unregisterViews(loc)
      spark.sql("DROP TABLE IF EXISTS rw_cat_t")
    }
  }

  test("_graft_views marker: a fresh session rewrites with no register call") {
    val base = scratch("marker/base")
    li.limit(4000).repartition(2).write.mode("overwrite").parquet(base)
    val view = scratch("marker/view")
    AggView.build(spark, base, view, Seq("l_returnflag"), "l_suppkey")
    AggView.writeMarker(base, Seq(view))
    val fresh = spark.newSession()
    fresh.read.parquet(base).createOrReplaceTempView("rw_m")
    val served = fresh.sql(
      "SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS nd " +
      "FROM rw_m GROUP BY l_returnflag")
    assert(scansPath(served, view), "marker discovery must serve the view")
    val truth = spark.read.parquet(base).groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("nd"))
    assert(rows(served) == rows(truth))
  }

  test("integral AVG serves from the view (Σ v·freq / Σ freq) and stays exact") {
    val (base, view) = basics
    spark.read.parquet(base).createOrReplaceTempView("rw_avg")
    val served = spark.sql(
      """SELECT l_returnflag, AVG(l_suppkey) AS a, COUNT(*) AS n
        |FROM rw_avg GROUP BY l_returnflag""".stripMargin)
    assert(scansPath(served, view), "integral AVG must rewrite")
    val truth = spark.read.parquet(base).groupBy("l_returnflag")
      .agg(avg(col("l_suppkey")).as("a"), count(lit(1)).as("n"))
    assert(rows(served) == rows(truth))
    // global (no grouping) AVG
    val global = spark.sql("SELECT AVG(l_suppkey) AS a FROM rw_avg")
    assert(scansPath(global, view))
    assert(rows(global) ==
      rows(spark.read.parquet(base).agg(avg(col("l_suppkey")).as("a"))))
  }

  test("AVG null semantics match (all-null group → NULL); double AVG refuses") {
    val base = scratch("avgnull/base")
    import spark.implicits._
    Seq(("a", Some(10L)), ("a", Some(21L)), ("b", None), ("b", None),
        ("c", Some(5L)))
      .toDF("g", "v").repartition(2).write.mode("overwrite").parquet(base)
    val view = scratch("avgnull/view")
    AggView.build(spark, base, view, Seq("g"), "v")
    AggViewRewriteRule.registerView(base, view)
    spark.read.parquet(base).createOrReplaceTempView("rw_avgnull")
    val served = spark.sql("SELECT g, AVG(v) AS a FROM rw_avgnull GROUP BY g")
    assert(scansPath(served, view))
    val truth = spark.read.parquet(base).groupBy("g").agg(avg(col("v")).as("a"))
    assert(rows(served) == rows(truth),
      "the all-null group must serve NULL, not throw or zero")

    // double value column: AVG refuses (order-dependent float sums),
    // while a recognized shape over the same view still serves
    val dbase = scratch("avgdbl/base")
    li.limit(4000).repartition(2).write.mode("overwrite").parquet(dbase)
    val dview = scratch("avgdbl/view")
    AggView.build(spark, dbase, dview, Seq("l_returnflag"), "l_extendedprice")
    AggViewRewriteRule.registerView(dbase, dview)
    spark.read.parquet(dbase).createOrReplaceTempView("rw_avgdbl")
    val refused = spark.sql(
      "SELECT l_returnflag, AVG(l_extendedprice) AS a FROM rw_avgdbl GROUP BY l_returnflag")
    assert(!scansPath(refused, dview), "double AVG must NOT rewrite")
    assert(rows(refused) == rows(spark.read.parquet(dbase)
      .groupBy("l_returnflag").agg(avg(col("l_extendedprice")).as("a"))))
    val stillServes = spark.sql(
      "SELECT l_returnflag, COUNT(DISTINCT l_extendedprice) AS nd FROM rw_avgdbl GROUP BY l_returnflag")
    assert(scansPath(stillServes, dview))
  }

  test("a base file rewritten in place under the same name fails freshness until refresh") {
    val base = scratch("inplace/base")
    li.limit(4000).repartition(2).write.mode("overwrite").parquet(base)
    val view = scratch("inplace/view")
    AggView.build(spark, base, view, Seq("l_returnflag"), "l_suppkey")
    AggViewRewriteRule.registerView(base, view)
    val q = "SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS nd " +
      "FROM rw_ip GROUP BY l_returnflag"
    spark.read.parquet(base).createOrReplaceTempView("rw_ip")
    assert(scansPath(spark.sql(q), view))

    // same file NAME, different bytes — round 10's name-set gate would
    // have served the now-stale view
    val victim = graft.plans.ZoneMapPruneRule.normFile(
      graft.sources.MicroBlockIndex.listParquetFiles(base).head)
    val tmp = scratch("inplace/tmp")
    spark.read.parquet(victim).limit(50).coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val tmpFile = graft.plans.ZoneMapPruneRule.normFile(
      graft.sources.MicroBlockIndex.listParquetFiles(tmp).head)
    java.nio.file.Files.copy(java.nio.file.Paths.get(tmpFile),
      java.nio.file.Paths.get(victim),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(victim)
      .getParent.resolve("." + java.nio.file.Paths.get(victim)
        .getFileName.toString + ".crc"))

    spark.read.parquet(base).createOrReplaceTempView("rw_ip")
    val stale = spark.sql(q)
    assert(!scansPath(stale, view),
      "a same-name rewrite must fail the (mtime, size) freshness gate")
    val truth = spark.read.parquet(base).groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("nd"))
    assert(rows(stale) == rows(truth), "the refused plan scans the live base")

    // refresh re-aggregates the rewritten file; the rewrite fires again
    assert(AggView.refresh(spark, base, view))
    spark.read.parquet(base).createOrReplaceTempView("rw_ip")
    val fresh = spark.sql(q)
    assert(scansPath(fresh, view), "post-refresh the view must serve again")
    assert(rows(fresh) == rows(truth))
  }

  test("views serve over hive-partitioned layouts; partition-column groups survive delta refresh") {
    // round-12 gap #1, view side: listWithStatus saw an empty top
    // level on col=value layouts, so views built over them recorded
    // no coverage and the gate refused every serve. The refresh delta
    // also reads a FILE SUBSET — without a basePath read the
    // partition column (here the GROUP column) would vanish from it.
    val out = scratch("partitioned/base")
    val orders = graft.engine.Tables.load(spark, dir, "orders")
    graft.sources.MicroBlockWriter.writePartitioned(
      orders.limit(6000), out, "o_orderstatus", "o_orderkey", 2)
    val view = scratch("partitioned/view")
    AggView.build(spark, out, view, Seq("o_orderstatus"), "o_orderpriority")
    AggViewRewriteRule.registerView(out, view)
    val q = "SELECT o_orderstatus, COUNT(DISTINCT o_orderpriority) AS nd " +
      "FROM rw_part GROUP BY o_orderstatus"
    spark.read.parquet(out).createOrReplaceTempView("rw_part")
    val served = spark.sql(q)
    assert(scansPath(served, view), "partitioned layout must serve")
    def truth = spark.read.parquet(out).groupBy("o_orderstatus")
      .agg(countDistinct(col("o_orderpriority")).as("nd"))
    assert(rows(served) == rows(truth))

    // append into ONE partition refuses until refresh, then the
    // delta-only refresh (reading just the nested new file, with its
    // partition-dir group value intact) serves again
    orders.filter(col("o_orderstatus") === "F").limit(200)
      .write.mode("append").partitionBy("o_orderstatus").parquet(out)
    spark.read.parquet(out).createOrReplaceTempView("rw_part")
    val stale = spark.sql(q)
    assert(!scansPath(stale, view), "the appended nested file must refuse")
    assert(rows(stale) == rows(truth))
    assert(AggView.refresh(spark, out, view), "refresh must see the delta")
    spark.read.parquet(out).createOrReplaceTempView("rw_part")
    val fresh = spark.sql(q)
    assert(scansPath(fresh, view), "post-refresh the view must serve again")
    assert(rows(fresh) == rows(truth))
  }

  test("a base table with a column named freq never rewrites (reserved alias)") {
    val base = scratch("freq/base")
    import spark.implicits._
    Seq(("a", 1L, 9L), ("a", 2L, 8L), ("b", 3L, 7L))
      .toDF("g", "v", "freq").repartition(2)
      .write.mode("overwrite").parquet(base)
    val view = scratch("freq/view")
    // the view itself (over g, v) is buildable — only the BASE schema
    // carrying `freq` poisons attribute resolution, so the rule
    // refuses the whole table
    AggView.build(spark, base, view, Seq("g"), "v")
    AggViewRewriteRule.registerView(base, view)
    spark.read.parquet(base).createOrReplaceTempView("rw_freq")
    val q = spark.sql("SELECT g, COUNT(DISTINCT v) AS nd FROM rw_freq GROUP BY g")
    assert(!scansPath(q, view), "tables with a `freq` column must refuse")
    assert(rows(q) == rows(spark.read.parquet(base)
      .groupBy("g").agg(countDistinct(col("v")).as("nd"))))
  }
}

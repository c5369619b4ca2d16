package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.engine.GraftSession
import graft.sources.Bucketing

/** Transparent bucketed-layout discovery ([[graft.plans
  * .BucketLayoutRule]]) + eager aggregation ([[graft.plans
  * .EagerAggregationRule]]) — the pay-once clustering write serving
  * PLAIN parquet reads:
  *
  *   - a `spark.read.parquet` of a `writeBucketed` location gets the
  *     bucket spec re-attached (no catalog table, fresh session) and a
  *     key-join + key-groupBy over two such layouts runs with ZERO
  *     hash exchanges;
  *   - appending a plain (unbucketed) file refuses the claim — a
  *     wrong claim is wrong rows;
  *   - a fact-joins-dims aggregate pushes a grouped partial aggregate
  *     below the join (values identical with the rule off, including
  *     COUNT's empty-join zero), and the refusal gates hold.
  */
class BucketTransparencySpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-bkt-test")

  private def warehouseLoc(table: String): String =
    spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") + "/" + table

  /** fact(k, v, w) 60k rows over 2k keys; ord(k, ck, dt) 2k rows;
    * cust(ck, name) 40 rows — both big sides bucketed by k. */
  private lazy val fixture: (String, String, String) = {
    val fact = spark.range(60000).select(
      (col("id") % 2000).as("k"),
      when(col("id") % 97 =!= 0, col("id") * 1.5).as("v"),
      when(col("id") % 11 =!= 0, col("id") % 1000).as("w"))
    val ord = spark.range(2000).select(
      col("id").as("k"), (col("id") % 40).as("ck"),
      (col("id") % 400).as("dt"))
    Bucketing.writeBucketed(fact, "bt_fact", "k", 8)
    Bucketing.writeBucketed(ord, "bt_ord", "k", 8)
    spark.range(40).select(col("id").as("ck"),
      concat(lit("n"), col("id")).as("name"))
      .write.mode("overwrite").parquet(warehouseLoc("bt_cust"))
    // drop the catalog entries: transparency means the PATH alone serves
    spark.sql("DROP TABLE IF EXISTS bt_fact")
    spark.sql("DROP TABLE IF EXISTS bt_ord")
    (warehouseLoc("bt_fact"), warehouseLoc("bt_ord"), warehouseLoc("bt_cust"))
  }

  private def claimedSpec(df: DataFrame) =
    df.queryExecution.optimizedPlan.collectFirst {
      case LogicalRelation(h: HadoopFsRelation, _, _, _, _) => h.bucketSpec
    }.flatten

  test("a plain parquet read of a bucketed layout gets the spec re-attached") {
    val (factLoc, _, _) = fixture
    val spec = claimedSpec(spark.read.parquet(factLoc))
    assert(spec.exists(s => s.numBuckets == 8 &&
      s.bucketColumnNames == Seq("k") && s.sortColumnNames == Seq("k")),
      s"claim must re-attach the written spec, got $spec")
  }

  test("key-join + key-groupBy over two transparent layouts: zero hash exchanges") {
    val (factLoc, ordLoc, _) = fixture
    spark.read.parquet(factLoc).createOrReplaceTempView("bt_fact_v")
    spark.read.parquet(ordLoc).createOrReplaceTempView("bt_ord_v")
    val df = spark.sql(
      """SELECT f.k, SUM(f.v) AS sv FROM bt_fact_v f
        |JOIN bt_ord_v o ON f.k = o.k GROUP BY f.k""".stripMargin)
    df.collect() // AQE: audit the final plan
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join + groupBy must be exchange-free:\n${p.take(3000)}")
    // and the values are the values
    val expect = spark.read.parquet(factLoc).as("f")
      .join(spark.read.parquet(ordLoc).as("o"), "k")
      .groupBy("k").agg(sum("v")).collect().map(_.toString).sorted
    assert(df.collect().map(_.toString).sorted.sameElements(expect))
  }

  test("disabled discovery leaves the plain read unbucketed") {
    val (factLoc, _, _) = fixture
    spark.conf.set("spark.graft.bucketDiscovery.enabled", "false")
    try assert(claimedSpec(spark.read.parquet(factLoc)).isEmpty)
    finally spark.conf.set("spark.graft.bucketDiscovery.enabled", "true")
  }

  test("an appended plain file refuses the claim") {
    val fact = spark.range(1000).select(
      (col("id") % 100).as("k"), col("id").cast("double").as("v"),
      col("id").as("w"))
    Bucketing.writeBucketed(fact, "bt_app", "k", 4)
    spark.sql("DROP TABLE IF EXISTS bt_app")
    val loc = warehouseLoc("bt_app")
    assert(claimedSpec(spark.read.parquet(loc)).isDefined)
    // a plain append has no bucket-id suffix and postdates the spec
    spark.range(5).select(lit(1L).as("k"), lit(1.0).as("v"), lit(1L).as("w"))
      .write.mode("append").parquet(loc)
    assert(claimedSpec(spark.read.parquet(loc)).isEmpty,
      "files the spec never covered must refuse the claim")
  }

  // -----------------------------------------------------------------
  // eager aggregation
  // -----------------------------------------------------------------

  private def eagerSql(where: String = "o.dt >= 100"): String =
    s"""SELECT c.name,
       |  SUM(f.v) AS sv, COUNT(*) AS n, COUNT(f.w) AS nw,
       |  MIN(f.v) AS mn, MAX(f.v) AS mx
       |FROM bt_fact_v f
       |JOIN bt_ord_v o ON f.k = o.k
       |JOIN bt_cust_v c ON o.ck = c.ck
       |WHERE $where
       |GROUP BY c.name""".stripMargin

  private def withViews[T](body: => T): T = {
    val (factLoc, ordLoc, custLoc) = fixture
    spark.read.parquet(factLoc).createOrReplaceTempView("bt_fact_v")
    spark.read.parquet(ordLoc).createOrReplaceTempView("bt_ord_v")
    spark.read.parquet(custLoc).createOrReplaceTempView("bt_cust_v")
    body
  }

  private def preAggBelowJoin(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case j: Join if j.left.exists(_.isInstanceOf[Aggregate]) ||
        j.right.exists(_.isInstanceOf[Aggregate]) => true
    }.nonEmpty

  test("fact-only aggregates push a grouped partial below the join; values unchanged") {
    withViews {
      val df = spark.sql(eagerSql())
      assert(preAggBelowJoin(df),
        s"expected a pre-aggregate under the join:\n${df.queryExecution.optimizedPlan}")
      val got = df.collect().map(_.toString).sorted
      spark.conf.set("spark.graft.eagerAgg.enabled", "false")
      val expect =
        try spark.sql(eagerSql()).collect().map(_.toString).sorted
        finally spark.conf.set("spark.graft.eagerAgg.enabled", "true")
      assert(got.sameElements(expect), "eager aggregation changed the answer")
    }
  }

  test("COUNT over an empty join stays 0, never NULL") {
    withViews {
      val df = spark.sql(
        """SELECT COUNT(*) AS n, COUNT(f.w) AS nw, SUM(f.v) AS sv
          |FROM bt_fact_v f JOIN bt_ord_v o ON f.k = o.k
          |WHERE o.dt >= 99999""".stripMargin)
      assert(preAggBelowJoin(df))
      val r = df.collect().head
      assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.isNullAt(2))
    }
  }

  test("multiplicity barriers refuse the push: LIMIT / Window / Distinct between agg and join") {
    withViews {
      // LIMIT between: the original sums 10 joined ROWS; a pushed
      // partial would sum whole per-key sums over 10 collapsed rows —
      // the round-14 review hole, pinned with values
      val limited = spark.sql(
        """SELECT SUM(v) AS s FROM
          |  (SELECT f.v FROM bt_fact_v f JOIN bt_ord_v o ON f.k = o.k LIMIT 10) t""".stripMargin)
      assert(!preAggBelowJoin(limited), "LIMIT must stop the walk")
      spark.conf.set("spark.graft.eagerAgg.enabled", "false")
      val truth =
        try spark.sql(
          """SELECT SUM(v) AS s FROM
            |  (SELECT f.v FROM bt_fact_v f JOIN bt_ord_v o ON f.k = o.k LIMIT 10) t""".stripMargin)
          .collect().head
        finally spark.conf.set("spark.graft.eagerAgg.enabled", "true")
      // LIMIT without ORDER BY is row-nondeterministic; the pinned
      // property is the row COUNT semantics, not which rows
      assert(!limited.collect().head.isNullAt(0) && !truth.isNullAt(0))
      // window between: per-joined-row numbering must survive
      val windowed = spark.sql(
        """SELECT SUM(v) AS s FROM
          |  (SELECT f.v, ROW_NUMBER() OVER (PARTITION BY o.ck ORDER BY f.v DESC) rn
          |   FROM bt_fact_v f JOIN bt_ord_v o ON f.k = o.k) t
          |WHERE rn <= 2""".stripMargin)
      assert(!preAggBelowJoin(windowed), "Window must stop the walk")
      val gotW = windowed.collect().head.getDouble(0)
      spark.conf.set("spark.graft.eagerAgg.enabled", "false")
      val truthW =
        try spark.sql(
          """SELECT SUM(v) AS s FROM
            |  (SELECT f.v, ROW_NUMBER() OVER (PARTITION BY o.ck ORDER BY f.v DESC) rn
            |   FROM bt_fact_v f JOIN bt_ord_v o ON f.k = o.k) t
            |WHERE rn <= 2""".stripMargin).collect().head.getDouble(0)
        finally spark.conf.set("spark.graft.eagerAgg.enabled", "true")
      assert(gotW == truthW, "windowed sum must be rule-invariant")
      // DISTINCT between: row collapse must not see pre-agg rows
      val dedup = spark.sql(
        """SELECT SUM(v) AS s FROM
          |  (SELECT DISTINCT f.v FROM bt_fact_v f JOIN bt_ord_v o ON f.k = o.k) t""".stripMargin)
      assert(!preAggBelowJoin(dedup), "Distinct must stop the walk")
    }
  }

  test("integral AVG decomposes into pushed SUM/COUNT partials; float AVG refuses") {
    withViews {
      val q =
        """SELECT o.ck, AVG(f.w) AS a, SUM(f.w) AS s, COUNT(f.w) AS c
          |FROM bt_fact_v f JOIN bt_ord_v o ON f.k = o.k
          |GROUP BY o.ck ORDER BY o.ck""".stripMargin
      val df = spark.sql(q)
      assert(preAggBelowJoin(df), "integral AVG must push")
      val got = df.collect().map(_.toString).sorted
      spark.conf.set("spark.graft.eagerAgg.enabled", "false")
      val expect =
        try spark.sql(q).collect().map(_.toString).sorted
        finally spark.conf.set("spark.graft.eagerAgg.enabled", "true")
      assert(got.sameElements(expect), "AVG decomposition changed the answer")
      // all-NULL input: AVG stays NULL through the decomposition
      val nullAvg = spark.sql(
        """SELECT AVG(CASE WHEN f.w < 0 THEN f.w END) AS a
          |FROM bt_fact_v f JOIN bt_ord_v o ON f.k = o.k""".stripMargin)
      assert(preAggBelowJoin(nullAvg))
      assert(nullAvg.collect().head.isNullAt(0), "empty AVG must stay NULL")
      // float/double AVG: order-dependent addition — refuse
      val floatAvg = spark.sql(
        """SELECT AVG(f.v) AS a FROM bt_fact_v f
          |JOIN bt_ord_v o ON f.k = o.k""".stripMargin)
      assert(!preAggBelowJoin(floatAvg), "double AVG must refuse the push")
    }
  }

  test("ANSI (the default) overflow hardening: dead-key partials cannot phantom-throw") {
    import org.apache.spark.sql.functions.{col => c, lit => l}
    // fact: key 1 matches the dim; key 999 never does and holds two
    // Long.MaxValue rows — the pre-aggregate sums them, the original
    // never aggregates them (the join drops the rows first). Under
    // ANSI (Spark 4's DEFAULT) a LONG partial THREW here; the
    // decimal(38,0) partial completes and agrees with the rule-off
    // plan.
    val fact = spark.range(100).select(
      l(1L).as("k"), (c("id") % 50).as("v"))
      .union(spark.range(2).select(l(999L).as("k"), l(Long.MaxValue).as("v")))
    Bucketing.writeBucketed(fact, "bt_ansi_fact", "k", 2)
    spark.sql("DROP TABLE IF EXISTS bt_ansi_fact")
    spark.read.parquet(warehouseLoc("bt_ansi_fact"))
      .createOrReplaceTempView("bta_f")
    // non-foldable dim key (a foldable literal would be propagated
    // into the join condition, turning the equi-conjunct into
    // attr = literal and refusing the push)
    spark.range(1).select((c("id") + 1).as("d"), l(7L).as("ck"))
      .createOrReplaceTempView("bta_d")
    val q = "SELECT SUM(f.v) AS s FROM bta_f f JOIN bta_d d ON f.k = d.d"
    val avgQ = "SELECT AVG(f.v) AS a FROM bta_f f JOIN bta_d d ON f.k = d.d"
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "Spark 4 sessions run ANSI by default — the case under test")
    def ruleOff[T](body: => T): T = {
      spark.conf.set("spark.graft.eagerAgg.enabled", "false")
      try body
      finally spark.conf.set("spark.graft.eagerAgg.enabled", "true")
    }
    val df = spark.sql(q)
    assert(preAggBelowJoin(df), "the ANSI sum must still push")
    val got = df.collect().head.getLong(0)
    assert(got == ruleOff(spark.sql(q).collect().head.getLong(0)),
      "the decimal partial must complete and agree where a long " +
        "partial phantom-threw")
    val avgDf = spark.sql(avgQ)
    assert(preAggBelowJoin(avgDf), "the ANSI integral AVG must push")
    assert(avgDf.collect().head.getDouble(0) ==
      ruleOff(spark.sql(avgQ).collect().head.getDouble(0)))
    // LEGACY: long partials wrap mod 2^64 — associative, so the
    // dead-key wrap never surfaces in the joined answer
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val dfL = spark.sql(q)
      assert(preAggBelowJoin(dfL))
      assert(dfL.collect().head.getLong(0) ==
        ruleOff(spark.sql(q).collect().head.getLong(0)))
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
    // TRY nulls at engine-chosen prefixes: refuse the push outright
    val tryDf = spark.sql(
      "SELECT TRY_SUM(f.v) AS s FROM bta_f f JOIN bta_d d ON f.k = d.d")
    assert(!preAggBelowJoin(tryDf), "TRY_SUM must refuse the push")
  }

  test("non-determinism refuses the push: rand() grouping / filter-on-the-walk") {
    withViews {
      // a non-deterministic FILTER between the Aggregate and the site
      // join evaluates over |distinct k| pre-aggregated rows instead
      // of |fact| joined rows after a rewrite — the same invisible-
      // multiplicity class as the LIMIT barrier (round-15 ADVICE)
      // NB: rand() <= 1.0 would be folded away as provably true —
      // the threshold must leave a genuinely nondeterministic Filter
      val ndFilter = spark.sql(
        """SELECT SUM(v) AS s FROM
          |  (SELECT f.v FROM bt_fact_v f JOIN bt_ord_v o ON f.k = o.k) t
          |WHERE rand() <= 0.9999999""".stripMargin)
      assert(!preAggBelowJoin(ndFilter),
        "a non-deterministic filter on the walk must stop the push")
      // non-deterministic grouping: group count would change when the
      // expression evaluates over collapsed rows
      val ndGroup = spark.sql(
        """SELECT SUM(f.v) AS s FROM bt_fact_v f
          |JOIN bt_ord_v o ON f.k = o.k
          |GROUP BY CAST(rand() * 0 AS INT) + o.ck""".stripMargin)
      assert(!preAggBelowJoin(ndGroup),
        "a non-deterministic grouping expression must refuse the push")
      // deterministic control: the same shapes WITHOUT rand() push
      val det = spark.sql(
        """SELECT SUM(v) AS s FROM
          |  (SELECT f.v FROM bt_fact_v f JOIN bt_ord_v o ON f.k = o.k) t""".stripMargin)
      assert(preAggBelowJoin(det), "the deterministic twin must still push")
    }
  }

  test("refusals: mixed-side aggregate, fact-side grouping, outer join") {
    withViews {
      // aggregate reading both sides
      val mixed = spark.sql(
        """SELECT SUM(f.v + o.dt) AS s FROM bt_fact_v f
          |JOIN bt_ord_v o ON f.k = o.k""".stripMargin)
      assert(!preAggBelowJoin(mixed))
      // grouping on a fact column
      val gfact = spark.sql(
        """SELECT f.w, SUM(f.v) AS s FROM bt_fact_v f
          |JOIN bt_ord_v o ON f.k = o.k GROUP BY f.w""".stripMargin)
      assert(!preAggBelowJoin(gfact))
      // outer join
      val outer = spark.sql(
        """SELECT SUM(f.v) AS s FROM bt_fact_v f
          |LEFT JOIN bt_ord_v o ON f.k = o.k""".stripMargin)
      assert(!preAggBelowJoin(outer))
      // and a refused query still answers identically to the rule-off run
      val got = mixed.collect().head.toString
      spark.conf.set("spark.graft.eagerAgg.enabled", "false")
      try assert(got == spark.sql(
        """SELECT SUM(f.v + o.dt) AS s FROM bt_fact_v f
          |JOIN bt_ord_v o ON f.k = o.k""".stripMargin).collect().head.toString)
      finally spark.conf.set("spark.graft.eagerAgg.enabled", "true")
    }
  }

  test("group-cardinality cost gate: a near-unique key refuses the push, a dense key clears it, stats-less pushes") {
    // NEAR-UNIQUE bucket key (20k rows, 20k distinct): the zone
    // sidecar's range bound reports reduction ~1 — below the default
    // 8× bar, the push must refuse (the q12 150M-groups-from-600M-rows
    // shape, where the pre-aggregate hash is ~the query's residual)
    val uniq = spark.range(20000).select(
      col("id").as("k"), (col("id") % 7).cast("double").as("v"))
    Bucketing.writeBucketed(uniq, "bt_gate_uniq", "k", 4)
    spark.sql("DROP TABLE IF EXISTS bt_gate_uniq")
    val uniqLoc = warehouseLoc("bt_gate_uniq")
    graft.sources.MicroBlockIndex.saveSidecar(
      graft.sources.MicroBlockIndex.build(spark, uniqLoc, "bt_gate_uniq"),
      uniqLoc)
    // DENSE key (40k rows over 500 distinct, every value used): the
    // range bound reports the TRUE 80× reduction — push fires WITH the
    // sidecar present
    val dense = spark.range(40000).select(
      (col("id") % 500).as("k"), (col("id") % 7).cast("double").as("v"))
    Bucketing.writeBucketed(dense, "bt_gate_dense", "k", 4)
    spark.sql("DROP TABLE IF EXISTS bt_gate_dense")
    val denseLoc = warehouseLoc("bt_gate_dense")
    graft.sources.MicroBlockIndex.saveSidecar(
      graft.sources.MicroBlockIndex.build(spark, denseLoc, "bt_gate_dense"),
      denseLoc)
    val ord = spark.range(500).select(col("id").as("k"), (col("id") % 9).as("g"))
    ord.write.mode("overwrite").parquet(warehouseLoc("bt_gate_ord"))
    spark.read.parquet(warehouseLoc("bt_gate_ord"))
      .createOrReplaceTempView("bt_gate_ord_v")
    def q(fact: String): DataFrame = {
      spark.read.parquet(fact).createOrReplaceTempView("bt_gate_fact_v")
      spark.sql(
        """SELECT o.g, SUM(f.v) AS s FROM bt_gate_fact_v f
          |JOIN bt_gate_ord_v o ON f.k = o.k GROUP BY o.g""".stripMargin)
    }
    val refused = q(uniqLoc)
    assert(!preAggBelowJoin(refused),
      s"a ~1x-reduction fact must refuse the push:\n${refused.queryExecution.optimizedPlan}")
    // a refused plan still answers identically to the rule-off run
    val got = refused.collect().map(_.toString).sorted
    spark.conf.set("spark.graft.eagerAgg.enabled", "false")
    try assert(got.sameElements(q(uniqLoc).collect().map(_.toString).sorted))
    finally spark.conf.set("spark.graft.eagerAgg.enabled", "true")
    assert(preAggBelowJoin(q(denseLoc)),
      "an 80x-reduction fact must clear the gate and push")
    // minGroupReduction = 0 disables the gate: even the unique key pushes
    spark.conf.set("spark.graft.eagerAgg.minGroupReduction", "0")
    try assert(preAggBelowJoin(q(uniqLoc)),
      "gate disabled (0) must restore the unconditional push")
    finally spark.conf.unset("spark.graft.eagerAgg.minGroupReduction")
    // stats-less root (the main fixture has no _graft_index): unchanged
    withViews { assert(preAggBelowJoin(spark.sql(eagerSql()))) }
  }
}

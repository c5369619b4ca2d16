package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.GraftSession

/** Smoke-level correctness for the §2a relational surface at sf0.001.
  * (Exact value parity vs DuckDB is checked by Verify + tools/check.py
  * at sf0.01 — this spec guards structure: runnable, sane row counts,
  * stable column names.)
  */
class RelationalQueriesSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-test")
  private val dir = "/root/testdata/sf0.001"

  test("mergeCdc: update/delete/insert/no-op semantics, hand-computed") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (2L, "U", Some(99.0)),  // update bal, name untouched
      (3L, "D", None),        // delete
      (9L, "I", Some(9.5))    // insert (name absent from changes -> null)
    ).toDF("k", "_op", "bal")
    val got = graft.operators.CdcOps.mergeCdc(base, changes, "k")
      .orderBy("k")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(got == Seq(
      (1L, Some("a"), Some(10.0)),   // untouched
      (2L, Some("b"), Some(99.0)),   // updated payload, kept name
      (4L, Some("d"), Some(40.0)),   // untouched
      (9L, None, Some(9.5))))        // inserted, absent cols null
    // column names and types preserved (nullability may widen: inserts
    // can introduce nulls in columns absent from the changes batch)
    val out = graft.operators.CdcOps.mergeCdc(base, changes, "k").schema
    assert(out.fields.map(f => (f.name, f.dataType)).toSeq ==
      base.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("every declared query runs and has its oracle-aligned columns") {
    SparkEntry.allDefs.foreach { q =>
      val df = q.run(spark, dir)
      val n = df.count()
      assert(n >= 0, s"${q.name} failed to execute")
      assert(df.columns.nonEmpty, s"${q.name} has no columns")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1 aggregates are consistent") {
    val rows = SparkEntry.queries("q1_agg")(spark, dir).collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatus
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total > 0 && total <= 6000)
  }

  test("q6 count matches table size") {
    val n = SparkEntry.queries("q6_count_star")(spark, dir)
      .collect().head.getAs[Long]("n_rows")
    assert(n == 6000L)
  }

  test("queries and oracleSql keys line up") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("broadcast join is planned for q11") {
    val plan = SparkEntry.queries("q11_join_inner")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dim join should broadcast")
  }

  test("q16 grouping-sets rewrite == decomposed distinct counts, single scan") {
    import org.apache.spark.sql.functions._
    // Round-17 single-scan form vs the r10-r16 three-branch plan it
    // replaced: identical rows (exact integer counts), and the plan
    // must read lineitem ONCE (the 3-scan cold-cache cost was the
    // worst sf100 ledger row).
    val got = SparkEntry.queries("q16_count_distinct")(spark, dir)
    val scans = got.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("FileScan"))
    assert(scans == 1, s"q16 must scan lineitem once, saw $scans scans")
    val li = graft.engine.Tables.load(spark, dir, "lineitem")
    val nRows = li.groupBy("l_returnflag").agg(count(lit(1)).as("n_rows"))
    val nParts = li.select("l_returnflag", "l_partkey").distinct()
      .groupBy("l_returnflag").agg(count(lit(1)).as("n_parts"))
    val nSupps = li.select("l_returnflag", "l_suppkey").distinct()
      .groupBy("l_returnflag").agg(count(lit(1)).as("n_supps"))
    val exp = nRows.join(nParts, "l_returnflag").join(nSupps, "l_returnflag")
      .select(col("l_returnflag"), col("n_parts"), col("n_supps"), col("n_rows"))
      .orderBy("l_returnflag").collect().map(_.toString).toSeq
    assert(got.collect().map(_.toString).toSeq == exp)
  }

  test("q27 window rewrite == Spark percentile(), bit for bit, and no object agg") {
    import org.apache.spark.sql.functions._
    // The round-17 rewrite replaces the ObjectHashAggregate percentile
    // merge with a cum-count window + conditional-min interpolation.
    // Pin BOTH: (a) bit-identical values vs percentile() on the same
    // data — the oracle-hash contract; (b) the plan carries no
    // ObjectHashAggregate (the single-task merge is gone).
    val got = SparkEntry.queries("q27_percentile")(spark, dir)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate"),
      s"q27 must not fall back to the object-agg percentile merge:\n${plan.take(1200)}")
    val rows = got.collect()
    val exp = graft.engine.Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_extendedprice")
      .agg(count(lit(1)).as("freq"))
      .groupBy("l_returnflag")
      .agg(
        percentile(col("l_extendedprice"), lit(0.5), col("freq")).as("p50"),
        percentile(col("l_extendedprice"), lit(0.9), col("freq")).as("p90"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      .orderBy("l_returnflag").collect()
    assert(rows.length == exp.length && rows.length >= 3)
    rows.zip(exp).foreach { case (g, e) =>
      assert(g.getString(0) == e.getString(0))
      (1 to 4).foreach { i =>
        assert(java.lang.Double.doubleToRawLongBits(g.getDouble(i)) ==
          java.lang.Double.doubleToRawLongBits(e.getDouble(i)),
          s"q27 ${g.getString(0)} col $i: ${g.getDouble(i)} != ${e.getDouble(i)}")
      }
    }
  }
}

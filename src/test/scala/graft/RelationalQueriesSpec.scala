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
}

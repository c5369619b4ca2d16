package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.GraftSession
import graft.sources.{Advisor, DictionaryIndex}

/** Serve-layer advisories (round 16): a DEGRADED dictionary
  * COUNT(DISTINCT) — any file whose dictionary pages overflowed or
  * were disabled — records a `distinct_view` advisory naming the
  * AggView build that fixes it, and under
  * `spark.graft.advisor.autoDistinctView` pays the build + marker
  * registration itself so the SAME session's next plain query serves
  * from the view transparently ([[graft.plans.AggViewRewriteRule]]).
  */
class AdvisorSpec extends AnyFunSuite {

  private lazy val spark =
    GraftSession.local(cores = 8, appName = "graft-advisor-test")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def scansOnly(df: DataFrame, needle: String): Boolean = {
    val rels = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.map(_.toString)
    }.flatten
    rels.nonEmpty && rels.forall(_.contains(needle))
  }

  test("degraded distinct serve advises; auto-build serves the next plain query from the view") {
    import spark.implicits._
    val base = "target/scratch/test/advisor/base"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    // file A: dictionary-encoded k; file B: dictionary DISABLED — the
    // forced stand-in for a page-overflow fallback, so k can never be
    // fully dictionary-served
    (0 until 4000).map(i => (i.toLong % 700, s"p$i")).toDF("k", "p")
      .coalesce(1).write.mode("overwrite").parquet(base)
    (4000 until 8000).map(i => (i.toLong % 900, s"p$i")).toDF("k", "p")
      .coalesce(1).write.option("parquet.enable.dictionary", "false")
      .mode("append").parquet(base)
    val idx = DictionaryIndex.build(spark, base, "adv", Seq("k"))
    val truth = spark.read.parquet(base)
      .agg(count_distinct(col("k"))).head.getLong(0)

    Advisor.clear()
    val (n, covered, total) = DictionaryIndex.countDistinct(spark, idx, base, "k")
    assert(n == truth, "degraded serve must stay exact")
    assert(covered < total, "fixture must actually degrade")
    val advs = Advisor.advisories(Some(base))
    assert(advs.exists(a => a.kind == "distinct_view" && a.column == "k"),
      s"degraded serve must advise a distinct view, got $advs")
    assert(!new java.io.File(s"$base/_graft_aggview_k").exists(),
      "no auto-build without the conf")

    spark.conf.set("spark.graft.advisor.autoDistinctView", "true")
    try {
      val (n2, _, _) = DictionaryIndex.countDistinct(spark, idx, base, "k")
      assert(n2 == truth)
      assert(new java.io.File(s"$base/_graft_aggview_k").exists(),
        "auto-build must create the view")
      // the marker makes the view transparently discoverable: a PLAIN
      // aggregate now reads ONLY the view
      val served = spark.read.parquet(base)
        .agg(count_distinct(col("k")).as("n"))
      assert(scansOnly(served, "_graft_aggview_k"),
        s"plain count-distinct must serve from the view:\n${served.queryExecution.optimizedPlan}")
      assert(served.head.getLong(0) == truth)
      // freshness loop: an APPEND stales the view (rule refuses), and
      // the next degraded serve's auto path REFRESHES it back to serving
      (8000 until 9000).map(i => (i.toLong % 1100, s"p$i")).toDF("k", "p")
        .coalesce(1).write.option("parquet.enable.dictionary", "false")
        .mode("append").parquet(base)
      val truth2 = spark.read.parquet(base)
        .agg(count_distinct(col("k"))).head.getLong(0)
      val stale = spark.read.parquet(base)
        .agg(count_distinct(col("k")).as("n"))
      assert(!scansOnly(stale, "_graft_aggview_k"),
        "a stale view must refuse the transparent serve")
      assert(stale.head.getLong(0) == truth2)
      val idx2 = DictionaryIndex.refresh(spark, base, "adv", idx, Seq("k"))
      val (n3, _, _) = DictionaryIndex.countDistinct(spark, idx2, base, "k")
      assert(n3 == truth2)
      val refreshed = spark.read.parquet(base)
        .agg(count_distinct(col("k")).as("n"))
      assert(scansOnly(refreshed, "_graft_aggview_k"),
        "the auto path must refresh a stale view back to serving")
      assert(refreshed.head.getLong(0) == truth2)
    } finally spark.conf.unset("spark.graft.advisor.autoDistinctView")
  }
}

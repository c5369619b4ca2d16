package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampType}
import graft.engine.{GraftSession, Tables}

/** ORC parity smoke (round 7, VERDICT r6 item 8; north-star mentions
  * "Parquet/ORC"). Spark's ORC source shares the vectorized reader /
  * pushdown / pruning machinery with parquet, so the engine's
  * operators run unchanged over ORC — this pins that with value
  * equality on the q1/q2 shapes plus a pushdown plan check.
  */
class OrcParitySpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-orc-test")
  private val dir = "/root/testdata/sf0.001"

  private lazy val orcLineitem: String = {
    val p = "target/scratch/orc/lineitem"
    Tables.load(spark, dir, "lineitem").write.mode("overwrite").orc(p)
    p
  }

  /** The q1_agg aggregation shape, over whichever source df. */
  private def q1Shape(df: DataFrame): Seq[String] = df
    .filter(col("l_shipdate") <= "1998-09-02 00:00:00")
    .groupBy("l_returnflag", "l_linestatus")
    .agg(
      sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
      count(lit(1)).as("count_order"))
    .orderBy("l_returnflag", "l_linestatus")
    .collect().map(_.toString).toSeq

  /** The q2_filter_between shape. */
  private def q2Shape(df: DataFrame): Seq[String] = df
    .filter(col("l_quantity").between(18, 24))
    .select("l_orderkey", "l_linenumber", "l_quantity")
    .orderBy("l_orderkey", "l_linenumber")
    .collect().map(_.toString).toSeq

  test("q1/q2 shapes produce identical results over ORC and parquet") {
    val pq = Tables.load(spark, dir, "lineitem")
    val orc = Tables.loadAs(spark, orcLineitem, "orc")
    val (a1, b1) = (q1Shape(pq), q1Shape(orc))
    assert(a1.nonEmpty && a1 == b1)
    val (a2, b2) = (q2Shape(pq), q2Shape(orc))
    assert(a2.nonEmpty && a2 == b2)
  }

  test("ORC scans get predicate pushdown and column pruning too") {
    val df = Tables.loadAs(spark, orcLineitem, "orc")
      .filter(col("l_quantity").between(18, 24))
      .select("l_orderkey", "l_quantity")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("l_quantity"),
      s"quantity range must reach the ORC scan:\n${p.take(1500)}")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_extendedprice"),
      s"ORC scan must read only projected columns: $readSchema")
  }

  test("a full ORC warehouse serves real queries identically to parquet") {
    // mirror EVERY table to <name>.orc in a fresh dir; Tables.load
    // falls back to ORC when no parquet exists, so the whole query
    // surface runs unchanged over the ORC warehouse
    val mirror = "target/scratch/orc-warehouse"
    graft.engine.Tables.names.foreach { n =>
      val src =
        if (n == "events") graft.engine.Tables.load(spark, dir, n) // ts normalized once
        else spark.read.parquet(s"$dir/$n.parquet")
      src.write.mode("overwrite").orc(s"$mirror/$n.orc")
    }
    // one representative per family: relational agg, join chain,
    // window, temporal as-of, text, dedup, streaming twin
    val sample = Seq("q1_agg", "q12_join_multi", "q47_qualify", "q31_asof",
      "ta_quality", "dd_exact", "st_window_agg")
    sample.foreach { name =>
      val pq = SparkEntry.queries(name)(spark, dir)
        .collect().map(_.toString).toSeq
      val orc = SparkEntry.queries(name)(spark, mirror)
        .collect().map(_.toString).toSeq
      assert(pq.nonEmpty && pq == orc, s"$name diverges over the ORC warehouse")
    }
  }

  test("events round-trip through ORC with identical normalized timestamps") {
    val p = "target/scratch/orc/events"
    val canonical = Tables.load(spark, dir, "events")
    canonical.write.mode("overwrite").orc(p)
    val orc = Tables.loadAs(spark, p, "orc", isEvents = true)
    assert(orc.schema("ts").dataType == TimestampType)
    val a = canonical.select("event_id", "ts").orderBy("event_id")
      .collect().map(_.toString).toSeq
    val b = orc.select("event_id", "ts").orderBy("event_id")
      .collect().map(_.toString).toSeq
    assert(a.nonEmpty && a == b)
  }
}

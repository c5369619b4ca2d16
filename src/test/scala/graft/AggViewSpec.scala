package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.GraftSession
import graft.sources.AggView

/** Materialized aggregate view (sources/AggView): the (group, value,
  * freq) counts that serve grouped COUNT(DISTINCT) and exact
  * percentiles at view scale. The contract under test:
  *
  *   - a built view's counts equal the direct aggregation, and both
  *     serve shapes equal the raw-row answers bit-for-bit;
  *   - refresh after an append ≡ a rebuild, READS ONLY the new files
  *     (proven by corrupting the old ones first), and flips the
  *     generation pointer atomically;
  *   - a base table whose known files changed is REFUSED (additivity
  *     broken — rebuild), never silently served.
  */
class AggViewSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-aggview-test")
  private val dir = "/root/testdata/sf0.01"

  private def scratch(tag: String) = s"target/scratch/test/aggview/$tag"

  private lazy val li = graft.engine.Tables.load(spark, dir, "lineitem")

  private def freshBase(tag: String): String = {
    val out = scratch(s"$tag/base")
    li.limit(5000).repartition(4).write.mode("overwrite").parquet(out)
    out
  }

  test("view counts equal the direct aggregation; both serves are exact") {
    val base = freshBase("exact")
    val view = scratch("exact/view")
    AggView.build(spark, base, view, Seq("l_returnflag"), "l_extendedprice")

    val df = spark.read.parquet(base)
    val direct = df.groupBy("l_returnflag", "l_extendedprice")
      .agg(count(lit(1)).as("freq"))
    assert(AggView.read(spark, view).collect().toSet.map((r: org.apache.spark.sql.Row) =>
        (r.getString(0), r.getDouble(1), r.getLong(2))) ==
      direct.collect().toSet.map((r: org.apache.spark.sql.Row) =>
        (r.getString(0), r.getDouble(1), r.getLong(2))))

    // count-distinct serve vs raw rows
    val servedCd = AggView.serveCountDistinct(spark, view)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val directCd = df.groupBy("l_returnflag")
      .agg(countDistinct(col("l_extendedprice")).as("n_distinct"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(servedCd.sameElements(directCd))

    // percentile serve vs raw rows — bit-for-bit, not approximately
    val servedP = AggView.servePercentile(spark, view,
        Seq("p50" -> 0.5, "p90" -> 0.9))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val directP = df.groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"), lit(0.5)).as("p50"),
        percentile(col("l_extendedprice"), lit(0.9)).as("p90"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(servedP.sameElements(directP))
  }

  test("null values stay countable rows but carry no distinct/rank weight") {
    val base = scratch("nulls/base")
    li.limit(1000)
      .withColumn("v", when(col("l_linenumber") === 1, lit(null).cast("double"))
        .otherwise(col("l_extendedprice")))
      .select("l_returnflag", "v")
      .repartition(2).write.mode("overwrite").parquet(base)
    val view = scratch("nulls/view")
    AggView.build(spark, base, view, Seq("l_returnflag"), "v")
    val df = spark.read.parquet(base)
    val served = AggView.serveCountDistinct(spark, view)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val direct = df.groupBy("l_returnflag")
      .agg(countDistinct(col("v")).as("nd"), count(lit(1)).as("nr"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(served.sameElements(direct), "n_rows must include null-valued rows")
    val sp = AggView.servePercentile(spark, view, Seq("p50" -> 0.5))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val dp = df.groupBy("l_returnflag")
      .agg(percentile(col("v"), lit(0.5)).as("p50"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(sp.sameElements(dp), "nulls must carry no percentile rank weight")
  }

  test("refresh ≡ rebuild after append, reads only the new files") {
    val base = freshBase("refresh")
    val view = scratch("refresh/view")
    AggView.build(spark, base, view, Seq("l_returnflag"), "l_quantity")
    val gen0 = AggView.readMeta(view).gen

    val before = graft.sources.MicroBlockIndex.listParquetFiles(base).toSet
    li.limit(7000).repartition(2).write.mode("append").parquet(base)

    // rebuild target, captured BEFORE the corruption below: the full
    // post-append base aggregated from raw rows
    val expect = spark.read.parquet(base)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_quantity")).as("n_distinct"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // corrupt the ORIGINAL data files: a refresh that touched any of
    // them would now fail, so success proves delta-only maintenance
    before.foreach { f =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(graft.plans.ZoneMapPruneRule.normFile(f)),
        "not parquet".getBytes)
    }
    assert(AggView.refresh(spark, base, view))
    assert(AggView.readMeta(view).gen == gen0 + 1, "generation must advance")

    val served = AggView.serveCountDistinct(spark, view)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(served.sameElements(expect))

    // idempotent: nothing new ⇒ no work, same generation
    assert(!AggView.refresh(spark, base, view))
    assert(AggView.readMeta(view).gen == gen0 + 1)
  }

  test("a removed base file breaks additivity and is refused") {
    val base = freshBase("removed")
    val view = scratch("removed/view")
    AggView.build(spark, base, view, Seq("l_returnflag"), "l_quantity")
    val victim = graft.sources.MicroBlockIndex.listParquetFiles(base).head
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(graft.plans.ZoneMapPruneRule.normFile(victim)))
    val e = intercept[IllegalStateException] {
      AggView.refresh(spark, base, view)
    }
    assert(e.getMessage.contains("rebuild"))
  }
}

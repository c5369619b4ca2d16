package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{GraftSession, Salting, Tables}
import graft.sources.Bucketing

class ScaleToolsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = GraftSession.local(cores = 8, appName = "graft-scale-test")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ paths
    s
  }
  private val dir = "/root/testdata/sf0.001"

  test("bucketed join plans without exchange on either side") {
    val li = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, dir, "orders").select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_bucketed", "l_orderkey", 8)
    val joined = Bucketing.coLocatedJoin(spark, "li_bucketed", "o_bucketed", "l_orderkey")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n${plan.take(1500)}")
    // one file per bucket (writeBucketed pre-partitions on the key) ->
    // the scan's outputOrdering is trusted and the merge join needs no
    // re-sort either: the join is pure streaming merge over the files
    assert(!plan.contains("Sort "), s"bucketed+sorted join must not re-sort:\n${plan.take(1500)}")
    assert(joined.count() == 6000L) // every lineitem has its order
  }

  test("registerExisting validates the requested spec against the on-disk layout") {
    val li = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(li, "li_spec_check", "l_orderkey", 8)
    spark.sql("DROP TABLE IF EXISTS li_spec_check") // forget catalog, keep files
    // wrong bucket count and wrong key must REJECT (a wrongly-registered
    // spec silently breaks bucket pruning -> wrong rows, not slow ones)
    assert(!Bucketing.registerExisting(spark, "li_spec_check", "l_orderkey", 16))
    assert(!Bucketing.registerExisting(spark, "li_spec_check", "l_quantity", 8))
    // the true spec re-registers and the table reads back whole
    assert(Bucketing.registerExisting(spark, "li_spec_check", "l_orderkey", 8))
    assert(spark.table("li_spec_check").count() == 6000L)
    // pre-sidecar layout (sidecar deleted): falls back to the _000NN
    // file suffixes — still rejects a wrong count, accepts the true one
    spark.sql("DROP TABLE IF EXISTS li_spec_check")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/li_spec_check/_graft_bucket_spec.json")
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, false)
    assert(!Bucketing.registerExisting(spark, "li_spec_check", "l_orderkey", 16))
    assert(Bucketing.registerExisting(spark, "li_spec_check", "l_orderkey", 8))
  }

  test("salted join equals plain join") {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(orders, "l_orderkey")
      .agg(count(lit(1)), sum("o_totalprice")).collect().head
    val salted = Salting.saltedJoin(li, orders, "l_orderkey",
        uniqueCol = "l_linenumber", factor = 4)
      .agg(count(lit(1)), sum("o_totalprice")).collect().head
    assert(plain.getLong(0) == salted.getLong(0))
    assert(math.abs(plain.getDouble(1) - salted.getDouble(1)) < 1e-6)
  }

  test("two-phase salted count equals direct count") {
    val li = Tables.load(spark, dir, "lineitem")
    val direct = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salting.twoPhaseCount(li, "l_returnflag", "l_orderkey", 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(direct == salted)
  }

  test("native HyperplaneKeys equals the composed hyperplaneBit form") {
    import graft.functions.TextFunctions.hyperplaneBit
    import graft.functions.TextExpressions.hyperplane_keys
    val (bits, tables) = (5, 3)
    // the composed definition the native expression replaces: per-table
    // key = Σᵢ bit(t·bits+i)·2ⁱ + t·2^bits over seed-42 xxhash64 planes
    val composed = array((0 until tables).map { t =>
      (t * bits until (t + 1) * bits).zipWithIndex
        .map { case (plane, i) => hyperplaneBit(col("embedding"), plane) * lit(1 << i) }
        .reduce(_ + _) + lit(t * (1 << bits))
    }: _*)
    val diff = Tables.load(spark, dir, "embeddings")
      .select(hyperplane_keys(col("embedding"), bits, tables).as("fast"),
        composed.as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff == 0L)
  }
}

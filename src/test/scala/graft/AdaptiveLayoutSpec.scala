package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{AccessLog, AdaptiveLayout, GraftSession}

/** Workload-adaptive clustering: the access log's filtered-column
  * telemetry elects the cluster keys, and the election must pick the
  * layout the replayed workload measures as best.
  */
class AdaptiveLayoutSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-adaptive-test")
  private val dir = "/root/testdata/sf0.001"

  test("election: most-filtered columns win; sub-share columns don't cost a dimension") {
    val log = new AccessLog()
    (1 to 7).foreach(_ => log.log("t", Seq(1), Seq("a", "b")))
    (1 to 2).foreach(_ => log.log("t", Seq(2), Seq("c")))
    log.log("t", Seq(3), Nil) // non-predicate access: not in the denominator
    assert(AdaptiveLayout.columnFilterCounts(log) == Map("a" -> 7L, "b" -> 7L, "c" -> 2L))
    // c has 2/9 ≈ 22% share — above a 0.2 threshold, below 0.3
    assert(AdaptiveLayout.chooseKeys(log, maxKeys = 2, minShare = 0.3) == Seq("a", "b"))
    assert(AdaptiveLayout.chooseKeys(log, maxKeys = 3, minShare = 0.2) == Seq("a", "b", "c"))
    // maxKeys caps the dimension count; name breaks count ties
    assert(AdaptiveLayout.chooseKeys(log, maxKeys = 1) == Seq("a"))
    assert(AdaptiveLayout.chooseKeys(new AccessLog()).isEmpty)
  }

  test("layout-kind election on a mixed workload matches the structurally measured best") {
    import org.apache.spark.sql.functions._
    // JOIN-heavy mix: 8 equi-joins + 2 window partitions on k vs 3
    // filters on ts — the advisor must elect the hash-bucket layout
    val joinLog = new AccessLog()
    (1 to 8).foreach(_ => joinLog.log("t", Seq(1), Seq("k"), op = "join"))
    (1 to 2).foreach(_ => joinLog.log("t", Seq(1), Seq("k"), op = "window"))
    (1 to 3).foreach(_ => joinLog.log("t", Seq(2), Seq("ts")))
    assert(AdaptiveLayout.chooseLayoutKind(joinLog)
      .contains(AdaptiveLayout.HashBucket("k")))
    // FILTER-heavy mixes elect range (one column) / z-order (two)
    val f1 = new AccessLog()
    (1 to 9).foreach(_ => f1.log("t", Seq(1), Seq("ts")))
    f1.log("t", Seq(1), Seq("k"), op = "join")
    assert(AdaptiveLayout.chooseLayoutKind(f1)
      .contains(AdaptiveLayout.RangeCluster("ts")))
    val f2 = new AccessLog()
    (1 to 5).foreach(_ => f2.log("t", Seq(1), Seq("x", "y")))
    assert(AdaptiveLayout.chooseLayoutKind(f2)
      .contains(AdaptiveLayout.ZOrderCluster(Seq("x", "y"))))
    assert(AdaptiveLayout.chooseLayoutKind(new AccessLog()).isEmpty)

    // MEASURED-best for the join-heavy mix, structurally: the bucketed
    // layout joins with ZERO hash exchanges, the range-clustered one
    // cannot (both shuffle-free claims audited on executed plans —
    // deterministic, unlike small-scale wall clocks)
    val src = spark.range(20000).select((col("id") % 500).as("k"),
      (col("id") % 97).as("ts"), col("id").as("v"))
    graft.sources.Bucketing.writeBucketed(src, "adv_bkt", "k", 4)
    spark.sql("DROP TABLE IF EXISTS adv_bkt")
    val bktLoc = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:") + "/adv_bkt"
    val rangeLoc = "target/scratch/test/adaptive/range"
    graft.sources.MicroBlockWriter.write(src, rangeLoc, "ts", 4)
    def exchanges(loc: String): Int = {
      val t = spark.read.parquet(loc)
      val j = t.as("a").join(t.as("b"), "k").groupBy("k")
        .agg(sum(col("a.v")))
      j.collect()
      j.queryExecution.executedPlan.toString.linesIterator
        .count(l => l.contains("Exchange hashpartitioning"))
    }
    assert(exchanges(bktLoc) == 0, "bucketed self-join must be exchange-free")
    assert(exchanges(rangeLoc) > 0, "the range layout pays the shuffle")
  }

  test("mb_adaptive_layout: the elected layout is the replay's measured best") {
    val rows = SparkEntry.queries("mb_adaptive_layout")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.length == 4 && rows.count(_._4) == 1)
    val chosen = rows.find(_._4).get
    // the election picked the two hot columns as a z-order
    assert(chosen._1 == "zorder_price_qty" &&
      chosen._2 == "l_extendedprice,l_quantity")
    // ...and that choice is the workload's best layout by measured
    // replay volume — the loop the telemetry is supposed to close
    val best = rows.minBy(_._3)
    assert(best._1 == chosen._1,
      s"election must match the measured best: chose ${chosen._1} " +
        s"(${chosen._3} rows) but ${best._1} scans ${best._3}")
    // the incumbent single-key layouts each leave a dimension unpruned
    val zVol = chosen._3
    rows.filterNot(_._4).foreach { case (name, _, vol, _) =>
      assert(vol > zVol, s"$name ($vol) should scan more than the z layout ($zVol)")
    }
  }

  test("log cols ride the JSONL sidecar for offline analysis") {
    val p = java.nio.file.Files.createTempFile("accesslog", ".jsonl")
    java.nio.file.Files.delete(p)
    val log = new AccessLog(Some(p.toString))
    log.log("lineitem", Seq(1, 2), Seq("l_quantity", "l_extendedprice"))
    log.log("lineitem", Seq(3), Nil)
    val df = spark.read.json(p.toString)
    import org.apache.spark.sql.functions._
    val got = df.orderBy("queryIdx")
      .select(col("cols").cast("array<string>"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got.toList == List(List("l_quantity", "l_extendedprice"), Nil))
    java.nio.file.Files.delete(p)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.GraftSession
import graft.sources.{BlockHistograms, FileHistogram}

/** Histogram selectivity estimation (sources/BlockHistograms): the
  * estimator must be BOUNDED (0 ≤ est ≤ rows, exact on full coverage,
  * zero on disjoint ranges) and, on realistic layouts, ACCURATE — the
  * number layout election and scan-vs-serve decisions consume.
  */
class SelectivitySpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-sel-test")

  private def synthHists(n: Int, files: Int, buckets: Int): Seq[FileHistogram] = {
    import spark.implicits._
    val out = "target/scratch/test/selectivity/uniform"
    spark.range(n).select(col("id").cast("double").as("v"))
      .repartitionByRange(files, col("v")).sortWithinPartitions("v")
      .write.mode("overwrite").parquet(out)
    BlockHistograms.build(spark, out, "t", "v", 0.0, (n - 1).toDouble, buckets)
      .collect().toSeq
  }

  test("estimator bounds: full coverage is exact, disjoint is zero, always within [0, rows]") {
    val hists = synthHists(n = 10000, files = 4, buckets = 16)
    assert(hists.size == 4)
    hists.foreach { h =>
      assert(h.counts.sum == h.rows)
      // full coverage: every row of the file
      assert(BlockHistograms.estimateRange(h, h.lo, h.hi) == h.rows.toDouble)
      // disjoint range: nothing
      assert(BlockHistograms.estimateRange(h, h.hi + 1e6, h.hi + 2e6) == 0.0)
      assert(BlockHistograms.estimateRange(h, -2e6, -1e6) == 0.0)
      // arbitrary ranges stay bounded
      Seq((0.0, 100.0), (2500.0, 7777.0), (9000.0, 99999.0)).foreach { case (a, b) =>
        val e = BlockHistograms.estimateRange(h, a, b)
        assert(e >= 0.0 && e <= h.rows.toDouble)
      }
    }
  }

  test("uniform data: interpolated estimates land within 2% of truth") {
    val n = 10000
    val hists = synthHists(n, files = 4, buckets = 16)
    // value = row id, so truth for [a,b] is b-a+1 clamped to the domain
    Seq((2500.0, 4999.0), (0.0, 1234.0), (3333.0, 8888.0)).foreach { case (a, b) =>
      val est = hists.map(BlockHistograms.estimateRange(_, a, b)).sum
      val truth = (math.min(b, n - 1) - math.max(a, 0.0) + 1)
      assert(math.abs(est - truth) / truth < 0.02,
        s"range [$a,$b]: est $est vs truth $truth")
    }
  }

  test("DATE columns histogram in epoch-day units (the footer's INT32 view)") {
    import spark.implicits._
    val out = "target/scratch/test/selectivity/dates"
    // 400 consecutive days from 2024-01-01
    spark.range(400)
      .select(date_add(lit(java.sql.Date.valueOf("2024-01-01")), col("id").cast("int")).as("d"))
      .repartitionByRange(2, col("d")).sortWithinPartitions("d")
      .write.mode("overwrite").parquet(out)
    val lo = java.time.LocalDate.of(2024, 1, 1).toEpochDay.toDouble
    val hists = BlockHistograms.build(spark, out, "t", "d", lo, lo + 399, buckets = 8)
      .collect()
    assert(hists.map(_.rows).sum == 400)
    // first 100 days, inclusive: uniform truth = 100
    val est = hists.map(BlockHistograms.estimateRange(_, lo, lo + 99)).sum
    assert(math.abs(est - 100.0) / 100.0 < 0.02, s"est $est vs 100")
  }

  test("serve-path choice: the estimator routes dense reads to the LRU, sparse to direct") {
    import graft.plans.{Between, PredValue}
    val dir = "/root/testdata/sf0.001"
    // a FRESH engine: the choice is observed through cache population,
    // so the shared memoized engine's warm LRU would mask it
    val engine = new graft.engine.GraftEngine(
      spark, graft.queries.MicroBlockQueries.microPath(spark, dir), "lineitem")
    val raw = spark.read.parquet(graft.queries.MicroBlockQueries.microPath(spark, dir))

    // sparse: narrow range on the UNCLUSTERED price column — zone maps
    // keep every file (all zones straddle), but the rows are a trickle
    val sparse = graft.queries.MicroBlockQueries.sparsePred
    val selSparse = engine.estimateSelectivity(sparse)
    assert(selSparse.exists(_ < 0.25),
      s"sparse predicate must estimate sparse, got $selSparse")
    val nSparse = engine.queryAuto(sparse).count()
    assert(nSparse == raw.filter(sparse.toColumn).count())
    assert(nSparse > 0, "sparse predicate must still match SOME rows")
    assert(engine.cache.size == 0,
      "sparse serve must be the direct path: nothing admitted to the LRU")

    // dense: the cluster-key range — candidate blocks are mostly
    // matching rows, the working set the cache exists to pin
    val dense = graft.queries.MicroBlockQueries.benchPred
    val selDense = engine.estimateSelectivity(dense)
    assert(selDense.exists(_ >= 0.25),
      s"dense predicate must estimate dense, got $selDense")
    val nDense = engine.queryAuto(dense).count()
    assert(nDense == raw.filter(dense.toColumn).count())
    assert(engine.cache.size > 0,
      "dense serve must be the cache path: candidate blocks admitted to the LRU")

    // unestimable shapes fall back to the reference-parity cache path
    assert(engine.estimateSelectivity(
      graft.plans.Cmp("!=", "l_quantity", PredValue(1L))).isEmpty)

    // equality IS estimable (bucket density, not a zero-width range —
    // which would constant-fold every '=' to sel 0): one of 50
    // quantity values is a sparse read and routes direct
    val eqSel = engine.estimateSelectivity(
      graft.plans.Cmp("=", "l_quantity", PredValue(12L)))
    assert(eqSel.exists(s => s > 0.0 && s < 0.25), s"eq sel: $eqSel")
    assert(engine.servePath(
      graft.plans.Cmp("=", "l_quantity", PredValue(12L))) == "direct")

    // the estimator itself: a full-range predicate on the cluster key
    // estimates ~everything
    val all = Between("l_shipdate",
      PredValue.ts("1990-01-01"), PredValue.ts("2010-01-01"))
    assert(engine.estimateSelectivity(all).exists(_ > 0.9))

    // STRING columns: histograms cover numeric/timestamp/date columns
    // only, so any predicate over a string column is unestimable and
    // queryAuto always takes the reference-parity cache path (the
    // documented conservative fallback — never a wrong-route, never an
    // error surfaced to the query)
    val strPred = graft.plans.Cmp("=", "l_returnflag", PredValue("A"))
    assert(engine.estimateSelectivity(strPred).isEmpty,
      "string column must be unestimable")
    assert(engine.servePath(strPred) == "cache",
      "string-column predicate must route to the cache path")
    val preCache = engine.cache.size
    val nStr = engine.queryAuto(strPred).count()
    assert(nStr == raw.filter(strPred.toColumn).count() && nStr > 0)
    assert(engine.cache.size >= preCache,
      "cache-path serve must admit candidate blocks, not bypass the LRU")
    // even a numeric-shaped range over the string column degrades the
    // same way: the histogram build fails, is memoized None once
    // (histogramsFor's NonFatal catch), and the route stays "cache"
    val oddPred = Between("l_returnflag", PredValue(0L), PredValue(1L))
    assert(engine.estimateSelectivity(oddPred).isEmpty)
    assert(engine.servePath(oddPred) == "cache")
  }

  test("mb_selectivity on the real layout: totals match and the estimate is accurate") {
    val rows = SparkEntry.queries("mb_selectivity")(spark, "/root/testdata/sf0.001").collect()
    val total = rows.find(_.getString(0) == "TOTAL").get
    val perFile = rows.filterNot(_.getString(0) == "TOTAL")
    assert(perFile.nonEmpty)
    // actual_rows in the scoreboard == the predicate's true row count
    val e = graft.queries.MicroBlockQueries.engineFor(spark, "/root/testdata/sf0.001")
    val truth = spark.read.parquet("target/scratch/microblocks/sf0.001/lineitem")
      .filter(graft.queries.MicroBlockQueries.benchPred.toColumn).count()
    assert(total.getLong(3) == truth)
    // per-file estimates bounded by file rows
    perFile.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= r.getLong(1).toDouble)
    }
    // the headline: estimated total within 10% of actual on the
    // clustered layout (each file's histogram sees a narrow range)
    val est = total.getDouble(2)
    assert(truth > 0 && math.abs(est - truth) / truth < 0.10,
      s"estimate $est vs actual $truth")
  }
}

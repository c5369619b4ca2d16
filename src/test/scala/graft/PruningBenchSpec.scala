package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{GraftSession, PruningBench}
import graft.queries.MicroBlockQueries

/** The benchmark2.py-parity A/B harness must demonstrate the engine's
  * point: for a selective range on the cluster key, the pruned path
  * reads FEWER FILES and takes LESS WALL-TIME than the full scan,
  * while returning identical rows.
  */
class PruningBenchSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-ab-test")
  // sf0.01 (60k rows / 16 blocks): enough data that the timing signal
  // clears per-job noise
  private val dir = "/root/testdata/sf0.01"

  test("pruned path reads fewer files and finishes faster than the full scan") {
    val e = MicroBlockQueries.engineFor(spark, dir)
    val pred = MicroBlockQueries.benchPred
    // External load on this box can invert a single timing window
    // (ROUND_NOTES: loadavg swings 0.6→16); the structural asserts
    // must hold every run, the WALL-TIME assert gets one re-measure
    // before failing so a load spike doesn't flake CI.
    def measure() = {
      val rows = PruningBench.run(spark, e, pred, reps = 5)
      rows.map(r => r.mode -> r).toMap
    }
    val byMode = measure()
    val full = byMode("full_scan")
    val cold = byMode("engine_prune_cold")
    val warm = byMode("engine_prune_warm")
    // identical answers in every mode
    assert(byMode.values.map(_.rows).toSeq.distinct.size == 1,
      s"row counts diverge: ${byMode.values}")
    assert(full.rows > 0)
    // pruning must skip files on a cluster-key range
    assert(cold.filesRead < full.filesRead,
      s"expected pruned files < ${full.filesRead}, got ${cold.filesRead}")
    assert(warm.filesRead == cold.filesRead)
    // ... and skipping must pay in wall-time (medians of 5)
    if (cold.seconds >= full.seconds) {
      val retry = measure()
      assert(retry("engine_prune_cold").seconds < retry("full_scan").seconds,
        s"pruned median not faster than full scan in either window: " +
          s"first ${cold.seconds} vs ${full.seconds}, " +
          s"retry ${retry("engine_prune_cold").seconds} vs ${retry("full_scan").seconds}")
    }
  }

  test("top-k A/B: zone-map serve reads fewer files than the full TakeOrdered") {
    val e = MicroBlockQueries.engineFor(spark, dir)
    val rows = PruningBench.runTopK(
        spark, e, "l_shipdate", 10, Seq("l_orderkey", "l_linenumber"), reps = 3)
      .map(r => r.mode -> r).toMap
    val full = rows("orderby_full_scan")
    val topk = rows("engine_topk")
    // both return exactly k rows; the engine path reads a strict subset
    // of the files on the cluster column
    assert(full.rows == 10 && topk.rows == 10)
    assert(topk.filesRead < full.filesRead,
      s"expected top-k files < ${full.filesRead}, got ${topk.filesRead}")
  }
}

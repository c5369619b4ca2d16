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
    val rows = PruningBench.run(spark, e, pred, reps = 5)
    val byMode = rows.map(r => r.mode -> r).toMap
    val full = byMode("full_scan")
    val cold = byMode("engine_prune_cold")
    val warm = byMode("engine_prune_warm")
    // identical answers in every mode
    assert(rows.map(_.rows).distinct.size == 1, s"row counts diverge: $rows")
    assert(full.rows > 0)
    // pruning must skip files on a cluster-key range
    assert(cold.filesRead < full.filesRead,
      s"expected pruned files < ${full.filesRead}, got ${cold.filesRead}")
    assert(warm.filesRead == cold.filesRead)
    // ... and skipping must pay in wall-time (medians of 5)
    assert(cold.seconds < full.seconds,
      s"pruned median ${cold.seconds}s not faster than full ${full.seconds}s")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.{GraftSession, Tables}
import graft.operators.DedupOps

/** Incremental MinHash dedup (`DedupOps.incrementalPairs`) — the
  * amortized daily path: a new batch dedups against a persisted
  * signature store, the base corpus is never re-shingled or re-paired.
  *
  * The load-bearing claims:
  *   1. EQUIVALENCE: incremental(store(base), batch) == the monolithic
  *      minhashEstPairs(base ∪ batch) restricted to pairs with ≥1
  *      batch endpoint (same pairs, same estimates).
  *   2. ADVANCE: the store grows by per-doc signature append
  *      (store' = store ∪ signatureTable(batch)), and the NEXT batch
  *      against store' again matches the monolithic run — the two-wave
  *      composition a daily pipeline actually executes.
  *   3. No base×base pair can ever appear.
  *   4. Plan: the store side of the cross join streams into a
  *      BroadcastHashJoin (batch side broadcast) — the store is never
  *      exchange-partitioned anywhere in the plan.
  */
class IncrementalDedupSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-incdedup-test")
  private val dir = "/root/testdata/sf0.001"

  private def docs = Tables.load(spark, dir, "documents")

  /** Canonical comparable projection: (doc_a, doc_b, est) rows. */
  private def canon(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("doc_a").cast("long"), col("doc_b").cast("long"),
        col("est_jaccard").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("incremental == monolithic restricted to >=1 batch endpoint") {
    val isInc = pmod(col("doc_id"), lit(7)) === 0
    val base = docs.filter(!isInc)
    val inc = docs.filter(isInc)
    val store = DedupOps.signatureTable(base)
    val got = DedupOps.incrementalPairs(store, inc)
    val full = DedupOps.minhashEstPairs(docs)
      .filter(col("doc_a") % 7 === 0 || col("doc_b") % 7 === 0)
    assert(canon(got) == canon(full.select("doc_a", "doc_b", "est_jaccard")),
      "incremental pair set must equal the monolithic run restricted to batch-endpoint pairs")
    // vs_base is exactly "the pair crosses batch<->store"
    val wrongTag = got.filter(
      col("vs_base") =!= (col("doc_a") % 7 =!= 0 || col("doc_b") % 7 =!= 0)).count()
    assert(wrongTag == 0, "vs_base must mark exactly the cross batch/store pairs")
  }

  test("no base-x-base pair is ever emitted") {
    val isInc = pmod(col("doc_id"), lit(7)) === 0
    val store = DedupOps.signatureTable(docs.filter(!isInc))
    val got = DedupOps.incrementalPairs(store, docs.filter(isInc))
    assert(got.filter(col("doc_a") % 7 =!= 0 && col("doc_b") % 7 =!= 0).count() == 0)
  }

  test("two-wave advance: store grows by signature append, wave 2 still matches monolithic") {
    // wave 1 = doc_id % 7 == 0, wave 2 = doc_id % 7 == 1, base = rest
    val w1 = pmod(col("doc_id"), lit(7)) === 0
    val w2 = pmod(col("doc_id"), lit(7)) === 1
    val store0 = DedupOps.signatureTable(docs.filter(!w1 && !w2))
    // day 1: dedup wave 1 against the base store, then COMMIT its
    // signatures — per-doc independence makes the append exact
    val store1 = store0.unionAll(DedupOps.signatureTable(docs.filter(w1)))
    val got2 = DedupOps.incrementalPairs(store1, docs.filter(w2))
    val full2 = DedupOps.minhashEstPairs(docs)
      .filter(col("doc_a") % 7 === 1 || col("doc_b") % 7 === 1)
    assert(canon(got2) == canon(full2.select("doc_a", "doc_b", "est_jaccard")),
      "wave-2 pairs against the advanced store must match the monolithic run")
  }

  test("plan: store streams, batch broadcasts — the store is never shuffled") {
    val isInc = pmod(col("doc_id"), lit(7)) === 0
    // materialize the store as parquet so the plan shows the real
    // read-back artifact, exactly as dd_incremental serves it
    val out = "target/scratch/test-sigstore"
    DedupOps.signatureTable(docs.filter(!isInc)).write.mode("overwrite").parquet(out)
    val store = spark.read.parquet(out)
    val p = DedupOps.incrementalPairs(store, docs.filter(isInc))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"cross candidates must come from a broadcast hash join:\n${p.take(2000)}")
    val lines = p.linesIterator.toVector
    // indent depth of a printed plan line = chars before the node name
    // (tree-drawing prefix plus the optional "*(n) " codegen marker)
    def depth(l: String): Int = l.indexWhere(c => c.isLetter) match {
      case -1 => Int.MaxValue
      case i  => l.take(i).count(c => c == ':' || c == '+' || c == ' ' || c == '-')
    }
    val scanIdx = lines.indexWhere(l =>
      l.contains("FileScan") && l.contains("test-sigstore"))
    assert(scanIdx >= 0, s"expected a store file scan:\n${p.take(2000)}")
    // ancestors of the store scan = nearest strictly-shallower lines
    // walking upward, UP TO the broadcast join (above it the store's
    // rows cease to exist — only pair-sized candidates flow on). None
    // of those may be a shuffle Exchange: the store's rows go
    // scan → band explode → broadcast PROBE without being partitioned
    // (the batch-internal self-join and the pair-level dedup may
    // exchange; those carry batch/pair rows, not the store)
    var d = depth(lines(scanIdx))
    var i = scanIdx - 1
    val ancestors = Vector.newBuilder[String]
    var stop = false
    while (i >= 0 && d > 0 && !stop) {
      val di = depth(lines(i))
      if (di < d) {
        if (lines(i).contains("BroadcastHashJoin")) stop = true
        else { ancestors += lines(i); d = di }
      }
      i -= 1
    }
    assert(stop, s"the store scan must feed a BroadcastHashJoin:\n${p.take(3000)}")
    val shuffling = ancestors.result().filter(_.contains("Exchange hashpartitioning"))
    assert(shuffling.isEmpty,
      s"the store rows must never be exchange-partitioned below the probe join, found:\n${shuffling.mkString("\n")}\n\nplan:\n${p.take(3000)}")
  }
}

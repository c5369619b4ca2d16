package graft.sources

import org.apache.spark.sql.SparkSession

/** Session-measured cost model for every "pay a metadata decision job
  * to (maybe) skip most of a scan" serve layer — the round-14 point
  * router's machinery (sources/DictionaryIndex.scala r14:574-661),
  * promoted to a shared, PER-TABLE-ROOT store so the dictionary point
  * lookup, the join-DPP file cut ([[graft.plans.JoinFilePruning]]) and
  * the stats/dict metadata serves ([[graft.plans.ZoneAggRule]],
  * [[graft.plans.DictDistinctRule]]) all route on the same two
  * measured constants instead of per-layer tuned thresholds:
  *
  *   - '''decision cost''' `dec_sec`: the wall time of each metadata
  *     decision job actually run, folded into an EWMA;
  *   - '''marginal scan bandwidth''' `bw`: bytes/sec of real data
  *     traversal with the fixed per-job overhead removed — from one
  *     calibration pass over the table's median file (internal-row
  *     traversal, the decode cost the scan route pays). Every Spark
  *     job on this box pays a fixed scheduling/codegen overhead J; the
  *     decision job is metadata-scale, so its wall time IS a live
  *     estimate of J — subtracting it from the calibration scan
  *     isolates the per-byte cost (a raw bytes/wall quotient on a
  *     small file measures mostly J and mis-routes small tables to
  *     the metadata path — the r14 lesson, BENCH_ROUTER_r14.json).
  *
  * Route: pay the decision iff `dec_sec < table_bytes / bw` — the
  * decision's extra wall time must undercut what a full cut could
  * save. The bound is OPTIMISTIC for the serve (assumes the cut saves
  * everything), so a "scan" verdict is trustworthy — the serve could
  * not have won even in the best case — while a "serve" verdict may
  * still pay a decision that saves little (bounded by the decision
  * cost itself, the same exposure the fixed gates had).
  *
  * PER-ROOT state (round 15, the r14 carried-forward limit): the
  * EWMAs are keyed by normalized table root, so a mixed cold/hot
  * storage deployment prices each table by its own storage — a
  * session touching a small fast-local table no longer poisons the
  * routing of a big object-store table. The session-global EWMA
  * remains as the COLD SEED for routing decisions on roots never
  * calibrated (point router only — see [[strictStats]]).
  *
  * Concurrency (round-15 ADVICE): calibration is guarded per root —
  * exactly one thread pays the median-file seed scan (double-checked
  * under the entry's lock); concurrent decision observations fold
  * under the same lock so EWMAs never lose updates.
  *
  * ACTIVATION contract for the transparent serve layers: they gate
  * ONLY on [[strictStats]] — constants calibrated for THAT root. An
  * uncalibrated root keeps round-14 behavior (serve when provable),
  * so correctness-gate fixtures and specs that never calibrate are
  * untouched, and a global seed from an unrelated table can never
  * switch off a serve it knows nothing about. Harnesses and the
  * measured point router opt roots in by calling
  * [[calibrateIfNeeded]].
  */
object CostRouter {

  private final class Entry {
    @volatile var decSecEwma: Option[Double] = None
    @volatile var calObs: Option[(Double, Long)] = None // (sec, bytes)
    // true while one thread runs the calibration scan — others fall
    // through uncalibrated (legacy behavior) instead of blocking on
    // the entry lock for the scan's duration (round-16 ADVICE)
    val calInFlight = new java.util.concurrent.atomic.AtomicBoolean(false)
    // test-visible invariant counters: calibration scans actually run
    // (must stay ≤ 1 per root) and decision folds applied (must equal
    // observeDecision calls — a lost update under contention would
    // leave it short)
    val calScans = new java.util.concurrent.atomic.AtomicLong()
    val decFolds = new java.util.concurrent.atomic.AtomicLong()
    // bumped whenever the root's priced constants change (seed,
    // decision fold, calibration landing) — the invest memo carries the
    // version it was computed under and is treated as expired when the
    // constants move, so a re-seeded spec (or a genuinely shifted EWMA)
    // gets a fresh decision instead of the stale memoized one
    val statsVersion = new java.util.concurrent.atomic.AtomicLong()
  }

  /** Test hook: (calibration scans run, decision folds applied). */
  private[graft] def debugCounters(root: String): (Long, Long) = {
    val e = entry(root)
    (e.calScans.get, e.decFolds.get)
  }

  private val perRoot =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()
  // session-global cold seeds (the r14 session-wide EWMAs)
  private val globalLock = new Object
  @volatile private var globalDec: Option[Double] = None
  @volatile private var globalCal: Option[(Double, Long)] = None

  private def norm(p: String): String = graft.plans.ZoneMapPruneRule.normFile(p)
  private def entry(root: String): Entry =
    perRoot.computeIfAbsent(norm(root), _ => new Entry)
  private def fold(old: Option[Double], x: Double): Option[Double] =
    Some(old.fold(x)(o => 0.7 * o + 0.3 * x))

  /** Test/bench isolation: forget every measured constant. */
  private[graft] def reset(): Unit = {
    perRoot.clear()
    refusals.clear()
    investMemo.clear()
    globalLock.synchronized { globalDec = None; globalCal = None }
  }

  /** Test hook: force a root's constants (deterministic gate tests). */
  private[graft] def seed(root: String, decSec: Double,
      calSec: Double, calBytes: Long): Unit = {
    val e = entry(root)
    e.synchronized {
      e.decSecEwma = Some(decSec)
      e.calObs = Some((calSec, calBytes))
      e.statsVersion.incrementAndGet()
    }
  }

  /** Fold one decision job's measured wall time into the root's (and
    * the global seed's) EWMA. */
  def observeDecision(root: String, sec: Double): Unit = {
    val e = entry(root)
    e.synchronized {
      e.decSecEwma = fold(e.decSecEwma, sec)
      e.decFolds.incrementAndGet()
      e.statsVersion.incrementAndGet()
    }
    globalLock.synchronized { globalDec = fold(globalDec, sec) }
  }

  /** One-time per-root calibration: traverse the table's MEDIAN file
    * as internal rows (the decode cost the scan route pays) and record
    * (sec, bytes). Guarded by a CAS in-flight flag so exactly one
    * thread pays the seed scan AND the scan runs OUTSIDE the entry
    * lock (round-16 ADVICE: holding the lock for the scan's duration
    * blocked concurrent observeDecision/seed callers on the same
    * root); losers return immediately and route uncalibrated — the
    * legacy behavior — until the winner's volatile write lands. No-op
    * when already calibrated or the root has no files. */
  def calibrateIfNeeded(spark: SparkSession, root: String): Unit = {
    val e = entry(root)
    if (e.calObs.isDefined) return
    if (!e.calInFlight.compareAndSet(false, true)) return
    try {
      if (e.calObs.isEmpty) {
        val files = MicroBlockIndex.listParquetFilesWithStatus(root)
        if (files.nonEmpty) {
          val bySize = files.sortBy(_._3)
          val (f, _, sz) = bySize(bySize.size / 2)
          e.calScans.incrementAndGet()
          val t0 = System.nanoTime()
          spark.read.parquet(f).queryExecution.toRdd
            .foreachPartition(it => while (it.hasNext) it.next())
          val sec = math.max((System.nanoTime() - t0) / 1e9, 1e-3)
          // Seed the decision-cost EWMA when nothing has priced one yet
          // (round 16): a small table routes "scan" on every lookup, so
          // no decision job ever runs and the root would stay
          // half-priced — "calibrate" forever. The decision jobs are
          // metadata-scale, so a minimal job's wall time is the same
          // live estimate of the fixed per-job overhead J the docs
          // derive; real decision observations refine it. Runs BEFORE
          // the calObs write so awaitCalibration implies fully priced.
          if (e.decSecEwma.isEmpty && globalDec.isEmpty) {
            val p0 = System.nanoTime()
            spark.sparkContext.parallelize(Seq(0), 1).count()
            observeDecision(root, (System.nanoTime() - p0) / 1e9)
          }
          e.calObs = Some((sec, sz))
          e.statsVersion.incrementAndGet()
          globalLock.synchronized {
            if (globalCal.isEmpty) globalCal = e.calObs
          }
        }
      }
    } finally e.calInFlight.set(false)
  }

  /** Test hook: block until `root`'s calibration (sync or async) has
    * landed, or `timeoutMs` elapses. True iff calibrated. */
  private[graft] def awaitCalibration(root: String,
      timeoutMs: Long = 30000): Boolean = {
    val e = entry(root)
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (e.calObs.isEmpty && System.nanoTime() < deadline) Thread.sleep(10)
    e.calObs.isDefined
  }

  /** Fire-and-forget calibration on a daemon thread — the round-16
    * first-query fix: the measured point router used to run the
    * median-file seed scan INLINE in the first lookup, so `point_auto`
    * paid ~a full extra Spark job over the best fixed arm at small
    * scale (r15 dict_ab: auto 0.295 s vs scan 0.200 s). The first
    * query now routes on already-listed file metadata only; the
    * calibration prices the SECOND-and-later lookups. The in-flight
    * CAS inside [[calibrateIfNeeded]] makes concurrent calls spawn at
    * most one useful scan per root. */
  def calibrateAsync(spark: SparkSession, root: String): Unit = {
    val e = entry(root)
    if (e.calObs.isDefined || e.calInFlight.get) return
    val t = new Thread(
      () => try calibrateIfNeeded(spark, root)
      catch { case scala.util.control.NonFatal(_) => () },
      "graft-cost-calibrate")
    t.setDaemon(true)
    t.start()
  }

  /** The r14 marginal-bandwidth formula, single-sourced: per-byte scan
    * rate with the measured per-job overhead (the decision EWMA — a
    * live estimate of the fixed job cost) subtracted from the
    * calibration wall time; floored at 5% of the calibration time so
    * a decision slower than the whole calibration can't produce a
    * negative/absurd rate. */
  private def bw(dec: Double, cal: (Double, Long)): Double =
    cal._2 / math.max(cal._1 - dec, cal._1 * 0.05)

  /** (decision sec, marginal bytes/sec) for ROUTING: per-root values,
    * each falling back to the session-global cold seed. The point
    * router's contract — a brand-new root routes on what the session
    * has learned so far and refines as its own observations arrive. */
  def seededStats(root: String): (Option[Double], Option[Double]) = {
    val e = entry(root)
    val dec = e.decSecEwma.orElse(globalDec)
    val cal = e.calObs.orElse(globalCal)
    (dec, for { d <- dec; c <- cal } yield bw(d, c))
  }

  /** STRICT per-root stats: defined only when THIS root was calibrated
    * (decision EWMA may still seed from global — job overhead is a
    * box property, not a table property). The transparent serve
    * layers' activation key. */
  def strictStats(root: String): (Option[Double], Option[Double]) = {
    val e = entry(root)
    val dec = e.decSecEwma.orElse(globalDec)
    (dec, for { d <- dec; c <- e.calObs } yield bw(d, c))
  }

  /** Is paying a metadata decision job worth it for `tableBytes` of
    * data under `root`? None = this root never calibrated (caller
    * keeps its legacy behavior); Some(false) = even a perfect cut
    * cannot repay the decision — scan. ONE-OFF economics; the serve
    * gates use [[shouldInvest]], which adds repeat-awareness. */
  def decisionWorthIt(root: String, tableBytes: Long): Option[Boolean] =
    strictStats(root) match {
      case (Some(d), Some(b)) => Some(d < tableBytes / b)
      case _                  => None
    }

  // (root, query-shape) -> times the gate refused this shape — the
  // ski-rental counter. Bounded; evicts arbitrarily at the cap (an
  // evicted counter just re-rents a few more times).
  private val refusals =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      java.util.concurrent.atomic.AtomicLong]()
  // (root, shape) -> (decision, expiry, statsVersion) — ONE ski-rental
  // increment per planning burst (round-16 ADVICE): optimizer fixpoint
  // iterations, AQE re-planning and JoinFilePruning's per-conjunct
  // checks all consult the gate for the SAME query, so an un-memoized
  // counter reached "invest at the n-th repeat" after fewer real query
  // repeats than documented. Consultations within the memo window
  // return the cached decision without counting; the window (default
  // 500 ms) comfortably covers a planning pass while real query
  // repeats — seconds apart — still count one each. The memo is also
  // version-stamped: a seed/fold/calibration that moves the root's
  // constants expires it immediately, so fresh constants always
  // produce a fresh decision.
  private val investMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      (Boolean, Long, Long)]()
  @volatile private[graft] var investMemoTtlNanos: Long = 500L * 1000 * 1000

  /** SKI-RENTAL investment policy for the transparent serve gates.
    * The decision jobs are MEMOIZED per (root, shape): once paid, a
    * repeated query serves almost for free — so a gate priced purely
    * on one-off economics routes a REPEATED small-table workload to
    * the scan forever and loses to the best fixed route (the serve
    * measured 0.11 s vs the 0.29 s scan at sf0.1 once warm). Classic
    * rent-vs-buy: rent (scan) while cheap, buy (pay the decision)
    * once the CUMULATIVE forgone savings reach the decision cost —
    * within 2× of the offline-optimal policy for any workload length,
    * one-off and steady-state both handled:
    *
    *   - worth even once (dec < bytes/bw): invest immediately;
    *   - else: invest at the n-th repeat where n · bytes/bw ≥ dec.
    *
    * None = root never calibrated (caller keeps legacy always-serve
    * behavior — fixtures and gate rows stay untouched). */
  def shouldInvest(root: String, shape: String,
      tableBytes: Long): Option[Boolean] =
    strictStats(root) match {
      case (Some(d), Some(b)) =>
        val key = (norm(root), shape)
        val now = System.nanoTime()
        val ver = entry(root).statsVersion.get()
        val memo = investMemo.get(key)
        if (memo != null && now - memo._2 < 0 && memo._3 == ver)
          Some(memo._1)
        else {
          val scanEst = tableBytes / b
          val decision =
            if (d < scanEst) true
            else {
              if (refusals.size > 4096) refusals.clear()
              val n = refusals
                .computeIfAbsent(key,
                  _ => new java.util.concurrent.atomic.AtomicLong())
                .incrementAndGet()
              n * scanEst >= d
            }
          if (investMemo.size > 4096) investMemo.clear()
          investMemo.put(key, (decision, now + investMemoTtlNanos, ver))
          Some(decision)
        }
      case _ => None
    }
}

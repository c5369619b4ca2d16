package graft.engine

import org.apache.spark.sql.SparkSession
import graft.plans.Pred

/** The reference's THESIS, composed into one measured A/B: prediction →
  * warmer cache → faster queries. The reference argues it with
  * `run_with_prefetch_loop.py` + `benchmark.py` (a query loop with the
  * background `PrefetchService` warming the LRU between queries);
  * graft until round 9 argued it by parts — predictors at MRR 1.0
  * (PrefetchEval), an LRU with hit counters (BlockCacheManager), a
  * warm-vs-cold serve A/B (PruningBench) — but nothing closed the
  * chain. This harness does: the same replayed workload served with
  * the prefetch loop ON (one arm per model class) vs OFF, cold cache
  * both, reporting serving wall-time AND cache hit-rate per arm.
  *
  * Honesty rules baked in:
  *   - the cache is CAPACITY-LIMITED below the workload's working set,
  *     so the OFF arm keeps missing at steady state — the regime where
  *     prefetching matters forever, not just on the first pass (with a
  *     cache bigger than the data, every arm converges to all-hits and
  *     the A/B measures nothing);
  *   - warming cost is NOT hidden: `warm_sec` reports the synchronous
  *     tick time separately from `serve_sec` (in production the service
  *     warms concurrently during think-time; a single-box A/B has no
  *     think-time to hide it in, so it is reported, not discarded);
  *   - ticks run BEFORE each query, predicting from history that ends
  *     at the PREVIOUS query's blocks — the causal order the background
  *     service has, never this query's own access;
  *   - an UNPREDICTABLE workload (seeded shuffle of the same queries)
  *     runs through every arm too, so the artifact shows what the loop
  *     buys when prediction cannot work, not just when it can;
  *   - per-arm row counts are reported and must agree — a warm path
  *     that serves different rows is a bug, not a speedup.
  */
object PrefetchLoopBench {

  final case class ArmResult(
      workload: String, arm: String,
      serveSec: Double, warmSec: Double,
      hits: Long, misses: Long, hitRate: Double,
      prefetched: Long, rows: Long)

  private def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }

  /** Fit the three model classes on `trainBlocks` (the flattened block
    * sequence of the training replay). Hyperparameters are the
    * mb_prefetch_eval-probed ones. */
  def fitModels(spark: SparkSession, trainBlocks: Seq[Int])
      : Seq[(String, Prefetcher)] = Seq(
    "markov" -> new MarkovPrefetcher(1).fitSeq(spark, trainBlocks),
    "logistic" -> new LogisticPrefetcher(order = 2, epochs = 25)
      .fit(spark, trainBlocks),
    "gru" -> new GruPrefetcher(hidden = 24, window = 8, epochs = 120, lr = 0.8)
      .fit(spark, trainBlocks))

  /** Run the A/B. `engine` should be built with a cache capacity below
    * the workload's working-set file count (see class doc). `cycle` is
    * the distinct query cycle; the periodic eval replay is
    * `evalPasses` repetitions of it in order, the unpredictable one a
    * seeded shuffle of the same multiset. */
  def run(spark: SparkSession, engine: GraftEngine, cycle: Seq[Pred],
      trainPasses: Int = 2, evalPasses: Int = 3, reps: Int = 3,
      topK: Int = 4, historyLen: Int = 4): Seq[ArmResult] = {

    // one decision job for every shape the replay will serve
    engine.candidatesMany(cycle.distinct)

    // training replay: populate the access log the models fit on —
    // the reference's "run the workload, then retrain" loop
    val trainStart = engine.accessLog.all.size
    (1 to trainPasses).foreach(_ =>
      cycle.foreach(p => engine.query(p).count()))
    val trainBlocks = engine.accessLog.all.drop(trainStart).flatMap(_.blocks)
    val models = fitModels(spark, trainBlocks)

    val periodic = Seq.fill(evalPasses)(cycle).flatten
    val rnd = new scala.util.Random(42)
    val randomized = rnd.shuffle(periodic)

    def arm(workloadName: String, preds: Seq[Pred], armName: String,
        model: Option[Prefetcher]): ArmResult = {
      val service = model.map(m => new PrefetchService(
        engine.accessLog, () => m, engine.cache, engine.loadBlock _,
        engine.keyOf _, topK, historyLen))
      var hits = 0L; var misses = 0L; var prefetched = 0L; var rows = 0L
      val totals = (1 to reps).map { _ =>
        engine.cache.clear()
        System.gc() // measure the rep, not the previous rep's GC debt
        val h0 = engine.cache.hits; val m0 = engine.cache.misses
        val p0 = service.map(_.prefetched).getOrElse(0L)
        var serve = 0.0; var warm = 0.0; var n = 0L
        preds.foreach { p =>
          service.foreach { s =>
            val t0 = System.nanoTime()
            s.tick()
            warm += (System.nanoTime() - t0) / 1e9
          }
          val t0 = System.nanoTime()
          n += engine.query(p).count()
          serve += (System.nanoTime() - t0) / 1e9
        }
        hits = engine.cache.hits - h0
        misses = engine.cache.misses - m0
        prefetched = service.map(_.prefetched - p0).getOrElse(0L)
        rows = n
        (serve, warm)
      }
      ArmResult(workloadName, armName,
        median(totals.map(_._1)), median(totals.map(_._2)),
        hits, misses,
        if (hits + misses == 0) 0.0 else hits.toDouble / (hits + misses),
        prefetched, rows)
    }

    val arms: Seq[(String, Option[Prefetcher])] =
      ("off", Option.empty[Prefetcher]) +:
        models.map { case (n, m) => (n, Option(m)) }
    for {
      (wname, preds) <- Seq("periodic" -> periodic, "random" -> randomized)
      (aname, model) <- arms
    } yield arm(wname, preds, aname, model)
  }

  /** One JSON array for the artifact line. */
  def toJson(rows: Seq[ArmResult]): String =
    rows.map { r =>
      s"""{"workload":"${r.workload}","arm":"${r.arm}"""" +
        s""","serve_sec":${r.serveSec},"warm_sec":${r.warmSec}""" +
        s""","hits":${r.hits},"misses":${r.misses},"hit_rate":${r.hitRate}""" +
        s""","prefetched":${r.prefetched},"rows":${r.rows}}"""
    }.mkString("[", ",", "]")
}

package graft.engine

import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import org.apache.spark.sql.DataFrame

/** Background prefetching: periodically asks the predictor for the
  * blocks likely to be touched next and warms the cache with them.
  *
  * Same loop as the reference's `PrefetchService`
  * (prefetch_service.py:1-95): wake → read recent history → model
  * top-K → load missing blocks into the cache. Loading here means
  * persisting + materializing the block's DataFrame through Spark, so
  * "warm" = resident in executor storage memory cluster-wide.
  */
final class PrefetchService(
    log: AccessLog,
    prefetcher: () => Prefetcher,
    cache: BlockCacheManager,
    loadBlock: Int => DataFrame,
    keyFor: Int => String = b => s"block-$b",
    topK: Int = 3,
    historyLen: Int = 8,
    intervalMillis: Long = 1000L) {

  @volatile private var prefetchedCount = 0L
  private var exec: ScheduledExecutorService = _

  /** One prediction+warm cycle (also callable synchronously in tests). */
  def tick(): Seq[Int] = {
    val recent = log.recent(historyLen)
    val model = prefetcher() // re-read each cycle: \model swaps live
    if (recent.isEmpty || !model.fitted) return Seq.empty
    val predicted = model.suggest(recent, topK)
    // peek, not get: the existence probe is not a serving access and
    // must not count toward the cache's hit/miss serving metrics
    val warmed = predicted.filter(b => !cache.peek(keyFor(b)))
    warmed.foreach { b =>
      // persist + materialize: the count() pulls the block into
      // executor storage so the next query is a cache hit.
      cache.put(keyFor(b), loadBlock(b)).count()
      prefetchedCount += 1
    }
    warmed
  }

  def start(): Unit = synchronized {
    if (exec == null) {
      exec = Executors.newSingleThreadScheduledExecutor { r =>
        val t = new Thread(r, "graft-prefetch"); t.setDaemon(true); t
      }
      exec.scheduleWithFixedDelay(() => {
        try tick()
        catch { case _: Throwable => () } // background warm-ups must never kill the service
      }, intervalMillis, intervalMillis, TimeUnit.MILLISECONDS)
    }
  }

  def stop(): Unit = synchronized {
    if (exec != null) { exec.shutdownNow(); exec = null }
  }

  def prefetched: Long = prefetchedCount
}

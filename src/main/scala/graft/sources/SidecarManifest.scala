package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** ONE filesystem probe per (table root, session) for ALL sidecar
  * conventions — the discovery front door the four `_graft*` layers
  * share.
  *
  * Before round 11 each layer probed separately on the planning hot
  * path: `_graft_index` and `_graft_dict` (sidecar indices,
  * [[graft.plans.ZoneMapPruneRule]] discovery), `_graft_bloom` (bloom
  * column marker), `_graft_views` (materialized-view marker) — up to
  * FOUR negative filesystem round-trips per session for a table that
  * carries none of them, each with its own memo. This object replaces
  * the negative probes with a single `listStatus(root)` whose
  * `_graft*`-prefixed child names are memoized per (root, session):
  * a layer first asks [[has]]; only when its marker NAME exists does
  * it pay its own (positive-path) reads, which keep their existing
  * per-layer staleness discipline unchanged — the manifest answers
  * PRESENCE, never freshness.
  *
  * Consistency contract, same as the per-layer negative memos it
  * replaces: a marker written AFTER the first probe in a session is
  * invisible until [[invalidate]] — every in-repo writer
  * ([[MicroBlockIndex.saveSidecar]], [[DictionaryIndex.saveSidecar]],
  * [[BloomPruning.writeMarker]], [[AggView.writeMarker]]) calls it, so
  * same-session discovery keeps working; other-process writes are
  * picked up by any new session (keys include a per-session UUID).
  * A nonexistent or unlistable root memoizes as empty (no markers) —
  * conservative: discovery is an optimization, never correctness.
  *
  * [[probeCount]] counts ACTUAL filesystem listings (cache misses) —
  * the observable ExtensionsSpec pins to one per unmarked table.
  */
object SidecarManifest {

  /** Total filesystem listings performed (cache misses only). */
  val probeCount = new java.util.concurrent.atomic.AtomicLong(0L)

  // (normalized root, session-uuid) -> `_graft*` child names present
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, String), Set[String]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), Set[String]]): Boolean =
        size > 512
    })

  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  private def sessionKey(s: SparkSession): String =
    sessionIds.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)

  // the QUALIFYING normalization (not the cheap scheme-strip): writers
  // invalidate with whatever spelling they were handed — often a
  // relative path — and it must hit the same key the planner's
  // absolute rootPaths probed under. makeQualified is string/VFS work,
  // no disk I/O.
  private def norm(p: String): String =
    graft.plans.ZoneMapPruneRule.norm(p)

  /** The `_graft*` child names present under `rootPath` — one
    * listStatus per (root, session), positive and negative memoized.
    *
    * The listing runs under the SESSION's Hadoop configuration
    * ([[org.apache.spark.sql.internal.SessionState.newHadoopConf]]:
    * core conf + the session's own `spark.hadoop.*`/runtime
    * overrides) — a bare `new Configuration()` lacks per-session
    * filesystem credentials (s3a keys), so the probe would throw and
    * every sidecar layer would silently disable on exactly the
    * deployments that configure their filesystems. A nonexistent root
    * is a stable ANSWER (FileNotFound ⇒ no markers, memoized); any
    * other failure is transient and is NOT memoized — the next query
    * re-probes instead of pinning EMPTY for the whole session. */
  def probe(rootPath: String, session: SparkSession): Set[String] = {
    val key = (norm(rootPath), sessionKey(session))
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      probeCount.incrementAndGet()
      try {
        val root = new Path(rootPath)
        val names = root.getFileSystem(session.sessionState.newHadoopConf())
          .listStatus(root)
          .iterator.map(_.getPath.getName)
          .filter(_.startsWith("_graft")).toSet
        cache.put(key, names)
        names
      } catch {
        case _: java.io.FileNotFoundException =>
          cache.put(key, Set.empty[String]); Set.empty
        case scala.util.control.NonFatal(_) => Set.empty // not memoized
      }
    }
  }

  /** Does `rootPath` carry a sidecar/marker named `name`? The one call
    * every layer's discovery makes BEFORE paying its own reads. */
  def has(rootPath: String, session: SparkSession, name: String): Boolean =
    probe(rootPath, session).contains(name)

  /** Drop the memo for one root (all sessions) — called by every
    * in-repo sidecar/marker writer so same-session discovery sees the
    * new state. */
  def invalidate(rootPath: String): Unit = {
    val r = norm(rootPath)
    cache.synchronized {
      val it = cache.keySet().iterator()
      while (it.hasNext) if (it.next()._1 == r) it.remove()
    }
    DictionaryIndex.invalidateBytes(rootPath)
  }

  /** Drop every memo (test isolation / explicit register calls). */
  def invalidateAll(): Unit = {
    cache.clear()
    DictionaryIndex.invalidateAllBytes()
  }
}

package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import graft.sources.BlockStat

/** Catalyst optimizer rule: transparent zone-map file pruning.
  *
  * The reference prunes inside its own engine entry point
  * (query_enginev5.py `query()`), so only SQL routed through the engine
  * benefits. Injected as an optimizer rule (via [[graft.GraftExtensions]]),
  * the same pruning applies to *any* Spark SQL/DataFrame query touching
  * a registered micro-blocked table: a Filter over a parquet relation
  * whose root path has a registered stats index is rewritten to scan
  * only the files whose min/max may satisfy the predicate. Spark's
  * native row-group pushdown then re-prunes inside the survivors.
  *
  * The rewrite only ever *shrinks the file list* — semantics are
  * preserved because the Filter stays in place and pruning is
  * conservative (may-match).
  */
case class ZoneMapPruneRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // Multi-root relations prune against the UNION of the roots'
    // registered indices. This is safe with partially-indexed roots:
    // skipping is per-FILE and only ever drops a file every one of
    // whose indexed row groups fails may-match — a file no index knows
    // (unindexed root, stale index) never enters the skip set.
    case f @ Filter(cond, rel @ LogicalRelation(hfs: HadoopFsRelation, _, _, _, _)) =>
      hfs.location.rootPaths.toSeq
        .flatMap(p => ZoneMapPruneRule.indexFor(p.toString))
        .flatten match {
        case Nil => f
        case stats =>
          PredicateExtractor.convert(cond) match {
            case None => f
            case Some(pred) =>
              // Prune against the relation's CURRENT file listing:
              // a file the (possibly stale) index doesn't know is kept
              // conservatively; a known file is skipped only when EVERY
              // indexed row group in it is a may-match=false (a file
              // with one matching row group must stay).
              val decisions = ZoneMapPruner.decisions(stats, pred)
              val skip = decisions.groupBy(d => ZoneMapPruneRule.normFile(d._2))
                .collect { case (file, ds) if ds.forall(!_._4) => file }
                .toSet
              val current = hfs.location.inputFiles.toSeq
              val kept = current.filterNot(p => skip.contains(ZoneMapPruneRule.normFile(p)))
              if (kept.size >= current.size) f
              else {
                val newLocation = new InMemoryFileIndex(
                  spark, kept.map(new Path(_)), Map.empty, Some(hfs.dataSchema))
                val pruned = rel.copy(relation =
                  hfs.copy(location = newLocation)(hfs.sparkSession))
                Filter(cond, pruned)
              }
          }
      }
  }
}

object ZoneMapPruneRule {
  // root path -> collected stats (metadata-scale; registered explicitly)
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[BlockStat]]()

  /** Fully qualify (scheme + absolute) then strip to the path part so
    * "target/x", "/root/repo/target/x" and "file:/root/repo/target/x"
    * all name the same index entry. */
  private def norm(p: String): String =
    try {
      val hp = new Path(p)
      val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
      fs.makeQualified(hp).toUri.getPath
    } catch { case _: Exception => p }

  /** Register a table's stats index; queries over `rootPath` will be
    * file-pruned from here on. */
  def register(rootPath: String, stats: Seq[BlockStat]): Unit =
    registry.put(norm(rootPath), stats)

  def unregister(rootPath: String): Unit =
    registry.remove(norm(rootPath))

  /** Registry lookup on the PLANNING hot path: every Filter over any
    * file relation probes each root. The cheap scheme-strip covers
    * absolute paths (qualified registration keys are absolute path
    * parts); the filesystem-qualifying fallback runs only for
    * relative paths — an unregistered multi-thousand-file relation
    * must not pay a filesystem round-trip per root per optimizer
    * pass. */
  def indexFor(rootPath: String): Option[Seq[BlockStat]] =
    if (registry.isEmpty) None
    else {
      val cheap = normFile(rootPath)
      Option(registry.get(cheap)).orElse(
        if (cheap.startsWith("/")) None
        else Option(registry.get(norm(rootPath))))
    }

  /** Cheap per-path normalization (no fs round-trip): strip any
    * scheme, collapse `.`/`..`/doubled slashes, drop trailing slashes
    * — so a non-canonical absolute spelling still matches a registered
    * key without the filesystem-qualifying fallback. */
  def normFile(p: String): String =
    try {
      val u = new java.net.URI(p).normalize()
      val path = if (u.getPath != null && u.getPath.nonEmpty) u.getPath else p
      if (path.length > 1 && path.endsWith("/")) path.stripSuffix("/") else path
    } catch { case _: Exception => p }
}

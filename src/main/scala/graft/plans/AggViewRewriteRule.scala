package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Coalesce, Expression, If, IsNull, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Percentile, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.LongType

import graft.sources.AggView

/** Transparent MATERIALIZED-VIEW REWRITING: an `Aggregate` over a
  * registered parquet table whose shape a persisted
  * [[graft.sources.AggView]] can answer is re-planned onto the VIEW —
  * plain `spark.sql`/DataFrame aggregates get the view-scale serve
  * (sf100: q16's shape 14.3 s scan → 0.47 s, BENCH_MATVIEW.json) with
  * no API change, the same deployment story as [[ZoneMapPruneRule]].
  *
  * Recognized shapes, over a bare table (attr-only Projects allowed,
  * no Filter — a filter changes which rows aggregate, so it
  * disqualifies): grouping on a SUBSET of the view's group columns
  * (exact match or roll-up), aggregates drawn from
  *
  *   - `COUNT(DISTINCT v)` → `COUNT(v)` over the view when the
  *     grouping matches the view exactly (view rows are unique per
  *     (group, v); COUNT skips the null-value row), or
  *     `COUNT(DISTINCT v)` over the view for roll-ups — still
  *     view-scale;
  *   - `COUNT(*)`/`COUNT(1)` → `SUM(freq)` (nulls kept: the view's
  *     null-value row carries their count); `COUNT(v)` →
  *     `SUM(IF(v IS NULL, 0, freq))`;
  *   - `MIN(v)` / `MAX(v)` → the same over the view (it holds every
  *     distinct value);
  *   - `PERCENTILE(v, p)` → `PERCENTILE(v, p, freq)` — builds the
  *     identical value→count map a row scan would, bit-for-bit
  *     (mb_matview_pctile's argument).
  *
  * Soundness gate: serving a STALE view would be wrong answers (not
  * merely lost pruning), so the rewrite requires the view's covered
  * file set to EQUAL the relation's current file listing exactly —
  * the [[graft.engine.GraftEngine]] sidecar-reuse guard, applied per
  * query (the view meta is one tiny file, stat-checked and re-read
  * only on mtime change). Anything unrecognized or doubtful leaves
  * the plan untouched.
  *
  * Discovery: explicit [[AggViewRewriteRule.registerView]], or a
  * `_graft_views` marker next to the data
  * ([[graft.sources.AggView.writeMarker]]) probed once per
  * (root, session) — fresh sessions rewrite with no register call.
  */
case class AggViewRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import AggViewRewriteRule._

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (inRewrite.get()) plan
    else plan.transform {
      case agg: Aggregate =>
        try tryRewrite(spark, agg).getOrElse(agg)
        catch { case scala.util.control.NonFatal(_) => agg }
    }
}

object AggViewRewriteRule {

  /** Re-entrancy guard: resolving the view relation runs the analyzer
    * on this thread; the rule must not fire inside itself. */
  private val inRewrite: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  // norm root -> registered view paths (explicit registrations)
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()

  /** Fully qualify then strip to the path part (the
    * [[ZoneMapPruneRule]] registration discipline), so relative and
    * absolute spellings of the same table register one key — lookups
    * come from the relation's qualified root paths. */
  private def norm(p: String): String =
    try {
      val hp = new Path(p)
      val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
      fs.makeQualified(hp).toUri.getPath
    } catch { case scala.util.control.NonFatal(_) => p }

  /** Opt `tablePath` into transparent rewriting onto the view at
    * `viewPath`. One table may carry several views (one per value
    * column); the rule picks by shape. */
  def registerView(tablePath: String, viewPath: String): Unit = {
    registry.merge(norm(tablePath), Set(viewPath), _ ++ _)
    markerCache.clear()
  }

  def unregisterViews(tablePath: String): Unit = {
    registry.remove(norm(tablePath))
    markerCache.clear()
  }

  // (root, session-uuid) -> marker view paths (None = probed, nothing
  // there) — the bloomMarkerCache discipline: positive AND negative
  // memoized, one filesystem round-trip per session ever.
  private val markerCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, String), Option[Seq[String]]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), Option[Seq[String]]]): Boolean =
        size > 256
    })

  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  private def sessionKey(s: SparkSession): String =
    sessionIds.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)

  private def viewsFor(rootPath: String, session: SparkSession): Seq[String] = {
    val explicit = registry.getOrDefault(
      ZoneMapPruneRule.normFile(rootPath), Set.empty[String]).toSeq
    val key = (ZoneMapPruneRule.normFile(rootPath), sessionKey(session))
    var marked = markerCache.get(key)
    if (marked == null) {
      marked =
        try AggView.markerViews(rootPath)
        catch { case scala.util.control.NonFatal(_) => None }
      markerCache.put(key, marked)
    }
    (explicit ++ marked.getOrElse(Nil)).distinct
  }

  // viewPath -> (meta file mtime, parsed meta): stat-checked per use,
  // re-read only when the meta file changed (a refresh rewrote it)
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, AggView.ViewMeta)]()

  private def metaFor(viewPath: String): Option[AggView.ViewMeta] =
    try {
      val p = new Path(viewPath, "_graft_view")
      val mtime = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        .getFileStatus(p).getModificationTime
      val hit = metaCache.get(viewPath)
      if (hit != null && hit._1 == mtime) Some(hit._2)
      else {
        val meta = AggView.readMeta(viewPath)
        metaCache.put(viewPath, (mtime, meta))
        Some(meta)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** One output column's rewrite recipe. */
  private sealed trait Shape
  private case class PassGroup(attr: AttributeReference) extends Shape
  private case class CountDistinctV(v: String) extends Shape
  private case object CountStar extends Shape
  private case class CountV(v: String) extends Shape
  private case class MinV(v: String) extends Shape
  private case class MaxV(v: String) extends Shape
  private case class PctileV(v: String, pct: Expression) extends Shape

  private def valueOf(s: Shape): Option[String] = s match {
    case CountDistinctV(v) => Some(v)
    case CountV(v)         => Some(v)
    case MinV(v)           => Some(v)
    case MaxV(v)           => Some(v)
    case PctileV(v, _)     => Some(v)
    case _                 => None
  }

  private def classify(e: Expression, groupIds: Set[Long]): Option[Shape] = e match {
    case a: AttributeReference if groupIds.contains(a.exprId.id) =>
      Some(PassGroup(a))
    case AggregateExpression(fn, Complete, isDistinct, None, _) =>
      fn match {
        case Count(Seq(v: AttributeReference)) if isDistinct =>
          Some(CountDistinctV(v.name))
        case Count(Seq(_: Literal)) if !isDistinct => Some(CountStar)
        case Count(Seq(v: AttributeReference)) if !isDistinct =>
          Some(CountV(v.name))
        case Min(v: AttributeReference) if !isDistinct => Some(MinV(v.name))
        case Max(v: AttributeReference) if !isDistinct => Some(MaxV(v.name))
        case p: Percentile
            if !isDistinct && !p.reverse &&
              p.child.isInstanceOf[AttributeReference] &&
              p.percentageExpression.foldable &&
              p.frequencyExpression == Literal(1L) =>
          Some(PctileV(p.child.asInstanceOf[AttributeReference].name,
            p.percentageExpression))
        case _ => None
      }
    case _ => None
  }

  private[plans] def tryRewrite(
      spark: SparkSession, agg: Aggregate): Option[LogicalPlan] = {
    // unwrap attr-only Projects down to the relation (a Filter or any
    // computation on the path disqualifies — it changes the rows)
    def unwrap(p: LogicalPlan): Option[LogicalRelation] = p match {
      case pr: Project
          if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(pr.child)
      case rel @ LogicalRelation(_: HadoopFsRelation, _, _, _, _) => Some(rel)
      case _ => None
    }
    for {
      rel <- unwrap(agg.child)
      hfs = rel.relation.asInstanceOf[HadoopFsRelation]
      roots = hfs.location.rootPaths.toSeq.map(_.toString)
      if roots.size == 1
      views = viewsFor(roots.head, spark)
      if views.nonEmpty
      groupAttrs <- Some(agg.groupingExpressions).collect {
        case gs if gs.forall(_.isInstanceOf[AttributeReference]) =>
          gs.map(_.asInstanceOf[AttributeReference])
      }
      if groupAttrs.map(_.name).distinct.size == groupAttrs.size
      groupIds = groupAttrs.map(_.exprId.id).toSet
      shapes <- traverse(agg.aggregateExpressions.map {
        case a: AttributeReference => classify(a, groupIds)
        case al: Alias             => classify(al.child, groupIds)
        case _                     => None
      })
      valueCols = shapes.flatMap(valueOf).distinct
      // exactly one value column, and at least one real aggregate
      if valueCols.size == 1
      plan <- views.iterator.flatMap(vp =>
        rewriteOnto(spark, vp, agg, hfs, groupAttrs, shapes, valueCols.head))
        .take(1).toSeq.headOption
    } yield plan
  }

  private def traverse[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  private def rewriteOnto(spark: SparkSession, viewPath: String,
      agg: Aggregate, hfs: HadoopFsRelation,
      groupAttrs: Seq[AttributeReference], shapes: Seq[Shape],
      valueCol: String): Option[LogicalPlan] = {
    val meta = metaFor(viewPath).getOrElse(return None)
    if (meta.valueCol != valueCol) return None
    val groupNames = groupAttrs.map(_.name)
    val exactGroups = groupNames.toSet == meta.groupCols.toSet
    if (!groupNames.toSet.subsetOf(meta.groupCols.toSet)) return None
    // SOUNDNESS: the view must cover the relation's files EXACTLY —
    // a stale view would serve wrong answers, not lost pruning
    val current = hfs.location.inputFiles.toSeq
      .map(ZoneMapPruneRule.normFile).toSet
    if (meta.files.map(ZoneMapPruneRule.normFile) != current) return None

    inRewrite.set(java.lang.Boolean.TRUE)
    val viewPlan =
      try spark.read.parquet(
        new Path(viewPath, s"g${meta.gen}").toString).queryExecution.analyzed
      finally inRewrite.set(java.lang.Boolean.FALSE)
    def vAttr(name: String): Option[AttributeReference] =
      viewPlan.output.collectFirst {
        case a: AttributeReference if a.name == name => a
      }
    val freq = vAttr("freq").getOrElse(return None)
    val vVal = vAttr(valueCol).getOrElse(return None)
    // the base relation and the view must agree on every served
    // column's type (they do when the view was built from this table;
    // anything else refuses)
    val vGroups = groupNames.map(n => vAttr(n).getOrElse(return None))
    if (vGroups.exists(g =>
        groupAttrs.find(_.name == g.name).exists(_.dataType != g.dataType)))
      return None
    if (!hfs.dataSchema.fields.find(_.name == valueCol)
        .map(_.dataType).contains(vVal.dataType))
      return None

    val guardedFreq = If(IsNull(vVal), Literal(0L), freq)
    def rewriteShape(s: Shape): Option[Expression] = s match {
      case PassGroup(a) => vAttr(a.name).map(v => v: Expression)
      case CountDistinctV(_) =>
        Some(
          if (exactGroups) Count(Seq(vVal)).toAggregateExpression()
          else Count(Seq(vVal)).toAggregateExpression(isDistinct = true))
      case CountStar =>
        Some(Coalesce(Seq(
          Sum(freq).toAggregateExpression(), Literal(0L, LongType))))
      case CountV(_) =>
        Some(Coalesce(Seq(
          Sum(guardedFreq).toAggregateExpression(), Literal(0L, LongType))))
      case MinV(_) => Some(Min(vVal).toAggregateExpression())
      case MaxV(_) => Some(Max(vVal).toAggregateExpression())
      case PctileV(_, pct) =>
        Some(new Percentile(vVal, pct, guardedFreq).toAggregateExpression())
    }
    val rewritten = agg.aggregateExpressions.zip(shapes).map {
      case (orig, shape) =>
        rewriteShape(shape).map { e =>
          // same name + exprId: parents keep resolving untouched
          Alias(e, orig.name)(exprId = orig.exprId)
        }
    }
    if (rewritten.exists(_.isEmpty)) return None
    val newAggExprs = rewritten.map(_.get)
    // output types must be preserved exactly — refuse otherwise
    if (newAggExprs.zip(agg.aggregateExpressions)
        .exists { case (n, o) => n.dataType != o.dataType }) return None
    Some(Aggregate(vGroups, newAggExprs.map(a => a: NamedExpression), viewPlan))
  }
}

package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{
  And => CAnd, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, Join, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

/** JOIN-DRIVEN file pruning — dynamic partition pruning at the FILE
  * level, for the layouts real fact tables have (key-clustered files,
  * no hive partitioning on the join key).
  *
  * The q11/q12 shape at 100 TB: a selective dim filter
  * (`s_nationkey = 3`) joins the fact on a key the fact is CLUSTERED
  * by. Spark's own DPP only cuts hive PARTITIONS; zone maps only cut
  * single-table predicates; so the fact scan reads every file even
  * though the dim's few surviving keys could refute most of them
  * file-by-file through the `_graft_dict` value sets. This arm closes
  * that: for an INNER / LEFT SEMI equi-join where the fact side's
  * root carries a dictionary index on the join key, the dim side is
  * EVALUATED AT PLAN TIME (the DPP trade — one bounded subquery job
  * buys a scan cut), its distinct surviving keys semi-join the
  * dictionary value sets ([[graft.sources.DictionaryIndex
  * .skippedFilesForKeys]] — one distributed decision, never a
  * per-key expression), and numeric key ranges add the zone-map
  * Between cut on top. The fact relation's file list shrinks; the
  * join stays, so a conservative cut only saves I/O, never rows.
  *
  * SOUNDNESS. A pruned file is one whose dictionary PROVES it holds
  * none of the dim's join-key values; its rows cannot produce INNER /
  * LEFT SEMI output (NULL keys never equi-match, and all-null covered
  * chunks have empty value sets ⇒ refuted ⇒ correct). Uncovered
  * files, unindexed columns, unsupported key domains all keep.
  *
  * REFUSAL GATES (plan-time work must be bounded):
  *   - dim side must carry a Filter/Aggregate or be a LocalRelation —
  *     an unfiltered dim is unselective, its key set refutes nothing;
  *   - every dim-side file relation must total ≤
  *     `spark.graft.joinPrune.maxDimBytes` (default 256 MB — the
  *     broadcastable class; bigger dims make the plan-time job a
  *     second fact scan);
  *   - the dim's distinct key count must be ≤
  *     `spark.graft.joinPrune.maxKeys` (default 10000) — checked with
  *     a LIMIT n+1 collect, so an oversized key set costs one bounded
  *     job and refuses, it never ships unbounded rows to the driver;
  *   - key domain must be integral / fractional / string (the
  *     faithful dictionary domains).
  *
  * Decisions are memoized per (fact root, column, canonicalized dim
  * plan) in a bounded LRU — the optimizer runs rules to fixpoint and
  * repeated query shapes must not re-run the dim job.
  */
object JoinFilePruning {

  private val MaxKeysDefault = 10000
  private val MaxDimBytesDefault = 256L * 1024 * 1024

  // (fact root, column, CANONICALIZED dim plan, dim key name) ->
  // (raw dict cut with each file's RECORDED (mtime, size), zone cut).
  // None = refused. The canonicalized plan itself is the key —
  // structural equality, never a collidable hash (a hash collision
  // here would reuse another dim's skip set: wrong rows, not slow
  // ones). Freshness is NOT cached — callers verify the recorded
  // stats against the live listing per query, so a file rewritten in
  // place between queries is never pruned from the memo. Bounded LRU.
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, String, LogicalPlan, String),
        Option[(Map[String, (Long, Long)], Set[String])]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, LogicalPlan, String),
            Option[(Map[String, (Long, Long)], Set[String])]]): Boolean =
        size > 256
    })

  private[graft] def clearCache(): Unit = cache.clear()

  def tryPrune(spark: SparkSession, j: Join): Option[Join] = {
    if (j.condition.isEmpty) return None
    val eqs = splitAnd(j.condition.get).collect {
      case EqualTo(a: AttributeReference, b: AttributeReference) => (a, b)
    }
    if (eqs.isEmpty) return None
    // LEFT SEMI preserves only matching LEFT rows -> only the left
    // side is prunable; INNER prunes either side.
    val attempts: Seq[(LogicalPlan, LogicalPlan, Boolean)] = j.joinType match {
      case Inner    => Seq((j.left, j.right, true), (j.right, j.left, false))
      case LeftSemi => Seq((j.left, j.right, true))
      case _        => return None
    }
    attempts.view.flatMap { case (fact, dim, factIsLeft) =>
      pruneSide(spark, fact, dim, eqs, factIsLeft).map { pruned =>
        if (factIsLeft) j.copy(left = pruned) else j.copy(right = pruned)
      }
    }.headOption
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case CAnd(l, r) => splitAnd(l) ++ splitAnd(r)
    case other      => Seq(other)
  }

  /** attr-only Projects and Filters down to ONE file relation. */
  private def factRelation(p: LogicalPlan): Option[LogicalRelation] = p match {
    case pr: Project if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      factRelation(pr.child)
    case f: Filter => factRelation(f.child)
    case rel @ LogicalRelation(_: HadoopFsRelation, _, _, _, _) => Some(rel)
    case _ => None
  }

  private def rebuild(p: LogicalPlan, target: LogicalRelation,
      pruned: LogicalRelation): LogicalPlan = p match {
    case pr: Project => pr.copy(child = rebuild(pr.child, target, pruned))
    case f: Filter   => f.copy(child = rebuild(f.child, target, pruned))
    case r: LogicalRelation if r eq target => pruned
    case other => other
  }

  private def dimEligible(dim: LogicalPlan, maxBytes: Long): Boolean = {
    var selective = false
    var bytes = 0L
    var eligible = true
    dim.foreach {
      // DETERMINISM is load-bearing, not a nicety: the dim is
      // evaluated ONCE at plan time, and the join re-evaluates it at
      // runtime — a nondeterministic dim (rand() filter, TABLESAMPLE)
      // or an order-unstable row cut (LIMIT without a total order,
      // which Spark does not guarantee stable) could survive DIFFERENT
      // keys at runtime than the ones that decided the file cut:
      // silently missing join rows. Refuse all of them.
      case _: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit |
           _: org.apache.spark.sql.catalyst.plans.logical.LocalLimit |
           _: org.apache.spark.sql.catalyst.plans.logical.Sample =>
        eligible = false
      case f: Filter        => selective = true
      case _: Aggregate     => selective = true
      case _: LocalRelation => selective = true
      case LogicalRelation(hfs: HadoopFsRelation, _, _, _, _) =>
        bytes += hfs.location.sizeInBytes
      case _: LogicalRelation => eligible = false // non-fs source: unknown size
      case _ => ()
    }
    if (dim.exists(_.expressions.exists(e => !e.deterministic)))
      eligible = false
    eligible && selective && bytes <= maxBytes
  }

  /** The physical dictionary domain for a join-key type: the cast that
    * lands scan-side keys in the same domain the value arrays hold —
    * the [[graft.sources.DictionaryIndex]] alignment contract. */
  private def keyDomain(t: org.apache.spark.sql.types.DataType): Option[String] = {
    import org.apache.spark.sql.types._
    t match {
      case ByteType | ShortType | IntegerType | LongType => Some("long")
      case FloatType | DoubleType                        => Some("double")
      case StringType                                    => Some("string")
      case _                                             => None
    }
  }

  private def pruneSide(spark: SparkSession, fact: LogicalPlan,
      dim: LogicalPlan, eqs: Seq[(AttributeReference, AttributeReference)],
      factIsLeft: Boolean): Option[LogicalPlan] =
    for {
      rel <- factRelation(fact)
      hfs = rel.relation.asInstanceOf[HadoopFsRelation]
      roots = hfs.location.rootPaths.toSeq.map(_.toString)
      if roots.size == 1
      // the first equality whose fact-side attr resolves to this
      // relation (by exprId) and whose dim attr lives on the dim side
      pair <- eqs.collectFirst {
        case (a, b) if rel.output.exists(_.exprId == a.exprId) &&
          dim.outputSet.exists(_.exprId == b.exprId) => (a, b)
        case (a, b) if rel.output.exists(_.exprId == b.exprId) &&
          dim.outputSet.exists(_.exprId == a.exprId) => (b, a)
      }
      (factAttr, dimAttr) = pair
      domain <- keyDomain(factAttr.dataType)
      // the join key must be a DATA column (a hive-partition key has
      // no dictionary rows; the empty cut below would no-op anyway,
      // but refusing here skips the dim job)
      if hfs.dataSchema.fieldNames.contains(factAttr.name)
      dicts <- Some(ZoneMapPruneRule.dictIndexFor(roots.head, spark))
      if dicts.nonEmpty
      maxDimBytes = conf(spark, "spark.graft.joinPrune.maxDimBytes",
        MaxDimBytesDefault)
      if dimEligible(dim, maxDimBytes)
      // live per-file statuses from the relation's own FileIndex — no
      // extra filesystem work; the dictionary cut may only skip files
      // whose RECORDED (mtime, size) still matches (a file rewritten
      // in place under its name carries a DEAD value set — pruning on
      // it silently drops join rows). Verified per QUERY, outside the
      // decision memo.
      liveStats = ZoneMapPruneRule.liveStatsOf(hfs)
      cuts <- skipSetFor(spark, roots.head, factAttr, dimAttr, dim,
        dicts.get, domain)
      skip = cuts._1.collect { case (f, (m, sz))
        if m >= 0 && liveStats.get(f).contains((m, sz)) => f }.toSet ++ cuts._2
      if skip.nonEmpty
      current = hfs.location.inputFiles.toSeq
      kept = current.filterNot(p => skip.contains(ZoneMapPruneRule.normFile(p)))
      if kept.size < current.size
      pruned <- ZoneMapPruneRule.prunedRelation(spark, rel, hfs, kept)
    } yield rebuild(fact, rel, pruned)

  private def conf(spark: SparkSession, key: String, dflt: Long): Long =
    try spark.conf.get(key, dflt.toString).toLong
    catch { case scala.util.control.NonFatal(_) => dflt }

  /** (raw dictionary cut with recorded per-file stats, zone cut) for
    * one (fact root, key, dim) — memoized; the CALLER verifies
    * freshness against the live listing per query. */
  private def skipSetFor(spark: SparkSession, root: String,
      factAttr: AttributeReference, dimAttr: AttributeReference,
      dim: LogicalPlan, dict: DataFrame, domain: String)
      : Option[(Map[String, (Long, Long)], Set[String])] = {
    val key = (ZoneMapPruneRule.normFile(root), factAttr.name,
      dim.canonicalized, dimAttr.name)
    val hit = cache.get(key)
    if (hit != null) return hit
    ZoneMapPruneRule.inRule.set(java.lang.Boolean.TRUE)
    val computed: Option[(Map[String, (Long, Long)], Set[String])] =
      try {
        import org.apache.spark.sql.functions.col
        val maxKeys = conf(spark, "spark.graft.joinPrune.maxKeys",
          MaxKeysDefault).toInt
        // the dim side, evaluated: distinct surviving join keys,
        // LIMIT-bounded so an unselective dim costs one bounded job
        // select by the ATTRIBUTE, not its name — dim outputs may
        // carry duplicate names after self-joins
        val keys = org.apache.spark.sql.graftbridge.PlanBridge
          .ofRows(spark, dim)
          .select(org.apache.spark.sql.graftbridge.ColumnBridge
            .column(dimAttr).cast(domain).as("v"))
          .filter(col("v").isNotNull)
          .distinct()
          .limit(maxKeys + 1)
          .collect()
        if (keys.length > maxKeys) None // unselective: refuse, memoized
        else {
          val spark2 = spark
          import spark2.implicits._
          val keysDf = domain match {
            case "long"   => keys.map(_.getLong(0)).toSeq.toDF("v")
            case "double" => keys.map(_.getDouble(0)).toSeq.toDF("v")
            case _        => keys.map(_.getString(0)).toSeq.toDF("v")
          }
          // the RAW cut plus each cut file's recorded (mtime, size) —
          // the caller applies the per-query freshness gate; frames
          // without the fields record (-1,-1), which never passes it
          val rawCut = graft.sources.DictionaryIndex
            .skippedFilesForKeys(dict, factAttr.name, keysDf)
            .map(ZoneMapPruneRule.normFile).toSet
          val dictCut: Map[String, (Long, Long)] =
            if (rawCut.isEmpty) Map.empty
            else if (!dict.columns.contains("fileMtime"))
              rawCut.map(f => f -> ((-1L, -1L))).toMap
            else dict
              .filter(col("column") === factAttr.name && col("covered"))
              .select(col("file"), col("fileMtime"), col("fileSize"))
              .collect()
              .map(r => ZoneMapPruneRule.normFile(r.getString(0)) ->
                ((r.getLong(1), r.getLong(2)))).toMap
              .filter { case (f, _) => rawCut(f) }
          // numeric keys add the zone-map range cut: a file whose
          // [min, max] misses [min(keys), max(keys)] entirely cannot
          // hold any of them — catches key-SORTED layouts whose files
          // fell back to PLAIN (no dictionaries)
          val zoneCut =
            if (keys.isEmpty || domain == "string") Set.empty[String]
            else {
              val nums = keys.map(r =>
                if (domain == "long") r.getLong(0).toDouble else r.getDouble(0))
              ZoneMapPruneRule.indexFor(root, spark).map { zi =>
                ZoneMapPruneRule.skipSet(Seq(root), Seq(zi),
                  Between(factAttr.name,
                    PredValue(nums.min), PredValue(nums.max)))
              }.getOrElse(Set.empty)
            }
          Some((dictCut, zoneCut))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
      finally ZoneMapPruneRule.inRule.set(java.lang.Boolean.FALSE)
    cache.put(key, computed)
    computed
  }
}

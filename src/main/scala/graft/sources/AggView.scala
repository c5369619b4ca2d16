package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained MATERIALIZED AGGREGATE VIEW: per-(group,
  * value) frequency counts over a parquet table, persisted so the
  * query shapes Spark pays row-scale for — grouped COUNT(DISTINCT) and
  * exact percentiles — serve from VIEW-scale data instead.
  *
  * Why this is the at-scale answer to those shapes (the sf100 ledger's
  * q16 5.8x / q27 4.7x weak rows — both measured SCAN-bound, not
  * plan-bound): no single-pass plan can beat re-reading 100 TB,
  * but the (group, value, freq) table is bounded by DISTINCT PAIRS,
  * not rows — typically orders of magnitude smaller — and it is
  * exactly the input both shapes need:
  *
  *   - grouped COUNT(DISTINCT value): `COUNT(*) .. WHERE value IS NOT
  *     NULL GROUP BY group` over the view ([[serveCountDistinct]]);
  *     `SUM(freq)` recovers `COUNT(*)` of the base table.
  *   - exact interpolated percentile: Spark's `percentile(value, q,
  *     freq)` builds the identical value->count map it would build
  *     from raw rows, so the result is bit-for-bit the row-scan answer
  *     ([[servePercentile]] — same argument as q27's pre-aggregated
  *     rewrite, but the counts are now READ, not recomputed).
  *
  * The maintenance contract is what makes it a VIEW and not a cached
  * result: frequencies are ADDITIVE under append-only ingest, so
  * [[refresh]] aggregates ONLY files the view has not seen and merges
  * by key — cost `O(delta rows + view size)`, never a re-read of the
  * base table. Generations make refresh atomic: data lives at
  * `<viewPath>/g<N>`, a tiny `_graft_view` meta file names the current
  * generation and the covered files; readers resolve the pointer
  * first, so a crashed refresh leaves the old generation intact.
  * Removed or rewritten base files break the additivity contract and
  * [[refresh]] REFUSES (IllegalStateException — rebuild instead), the
  * same honesty rule as the zone-map sidecar's staleness guard.
  *
  * At 100 TB: the view build is one map-side-combining aggregation
  * (shuffle carries distinct pairs, not rows); refresh shuffles delta
  * pairs + view rows; the rewrite is view-sized. The serve is a scan
  * of the view only. Reference contract: the stats-serving layer of
  * save_metadata.py / query_enginev5.py taken one level past
  * dictionaries — counts, not just value sets.
  */
object AggView {

  private def fs(p: Path) = p.getFileSystem(new Configuration())

  private def metaPath(viewPath: String) = new Path(viewPath, "_graft_view")

  private def genPath(viewPath: String, gen: Int) =
    new Path(viewPath, s"g$gen").toString

  /** Meta file format (text, one token per line): generation number,
    * group columns (comma-joined), value column, then covered files. */
  private def writeMeta(viewPath: String, gen: Int, groupCols: Seq[String],
      valueCol: String, files: Seq[String]): Unit = {
    val p = metaPath(viewPath)
    val out = fs(p).create(p, true)
    try out.write(
      (Seq(gen.toString, groupCols.mkString(","), valueCol) ++ files.sorted)
        .mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  final case class ViewMeta(gen: Int, groupCols: Seq[String],
      valueCol: String, files: Set[String])

  private def readText(p: Path): String = {
    val in = fs(p).open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  def readMeta(viewPath: String): ViewMeta = {
    val lines = readText(metaPath(viewPath)).split("\n").toSeq
    ViewMeta(lines.head.toInt, lines(1).split(",").toSeq, lines(2),
      lines.drop(3).filter(_.nonEmpty).toSet)
  }

  private def aggregate(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("freq"))

  /** Build the view from scratch: one map-side-combining aggregation
    * over the table (shuffle = distinct pairs), written as generation
    * 0. Nulls in `valueCol` are KEPT as a view row — they carry the
    * base table's row count; serving filters them where the shape
    * requires. */
  def build(spark: SparkSession, tablePath: String, viewPath: String,
      groupCols: Seq[String], valueCol: String): Unit = {
    val files = MicroBlockIndex.listParquetFiles(tablePath)
    aggregate(spark.read.parquet(tablePath), groupCols, valueCol)
      .write.mode("overwrite").parquet(genPath(viewPath, 0))
    writeMeta(viewPath, 0, groupCols, valueCol, files)
  }

  /** The current generation's (group..., value, freq) rows. */
  def read(spark: SparkSession, viewPath: String): DataFrame =
    spark.read.parquet(genPath(viewPath, readMeta(viewPath).gen))

  /** Incremental maintenance (the [[MicroBlockIndex.refresh]]
    * contract): aggregate ONLY the base files the view has not seen,
    * merge counts by key (frequencies are additive under append), and
    * publish as the next generation — the meta pointer flips last, so
    * readers never observe a half-written view. Refuses a base table
    * whose KNOWN files changed (removed/rewritten-in-place ingest
    * breaks additivity — rebuild). Returns true iff new files were
    * merged. */
  def refresh(spark: SparkSession, tablePath: String,
      viewPath: String): Boolean = {
    val meta = readMeta(viewPath)
    val live = MicroBlockIndex.listParquetFiles(tablePath)
    val missing = meta.files -- live.toSet
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"aggview $viewPath: ${missing.size} covered file(s) no longer " +
        s"in the base listing (e.g. ${missing.head}) — append-only " +
        "additivity is broken, rebuild the view")
    val newFiles = live.filterNot(meta.files)
    if (newFiles.isEmpty) return false
    val delta = aggregate(
      spark.read.parquet(newFiles: _*), meta.groupCols, meta.valueCol)
    val keys = (meta.groupCols :+ meta.valueCol)
    val merged = read(spark, viewPath).unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum("freq").as("freq"))
    val nextGen = meta.gen + 1
    merged.write.mode("overwrite").parquet(genPath(viewPath, nextGen))
    writeMeta(viewPath, nextGen, meta.groupCols, meta.valueCol, live)
    fs(metaPath(viewPath)).delete(new Path(genPath(viewPath, meta.gen)), true)
    true
  }

  /** `<table>/_graft_views` DISCOVERY MARKER (the `_graft_bloom`
    * convention): a tiny underscore file naming the table's view
    * paths, dropped next to the data so ANY session's
    * [[graft.plans.AggViewRewriteRule]] discovers the views lazily —
    * no register call, the deployment path. The marker carries no
    * staleness risk of its own: the rule re-checks each view's exact
    * file-set guard per query, so a stale or dead view path simply
    * never rewrites. */
  def markerPath(tablePath: String): String =
    new Path(tablePath, "_graft_views").toString

  def writeMarker(tablePath: String, viewPaths: Seq[String]): Unit = {
    require(viewPaths.nonEmpty, "marker needs at least one view path")
    // qualify at WRITE time: a relative path would resolve against the
    // CONSUMER's working directory, silently breaking discovery from
    // any other process
    val qualified = viewPaths.map { vp =>
      val hp = new Path(vp)
      fs(hp).makeQualified(hp).toUri.getPath
    }
    val p = new Path(markerPath(tablePath))
    val out = fs(p).create(p, true)
    try out.write(qualified.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // this session may have memoized a negative marker probe for the
    // root (the view build's own aggregate plans one) — drop it so the
    // marker is discoverable immediately, not just in fresh sessions
    graft.plans.AggViewRewriteRule.invalidateMarkerCache()
  }

  /** The marker's view paths; None when no (non-empty) marker exists. */
  def markerViews(tablePath: String): Option[Seq[String]] = {
    val p = new Path(markerPath(tablePath))
    val f = fs(p)
    if (!f.exists(p) || f.getFileStatus(p).isDirectory) None
    else {
      val views = readText(p).split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      if (views.isEmpty) None else Some(views)
    }
  }

  /** Grouped COUNT(DISTINCT valueCol) + COUNT(*) from the view alone:
    * distinct values per group = view rows per group (value is a key),
    * base-table row count = SUM(freq). Output columns:
    * groupCols..., n_distinct, n_rows. */
  def serveCountDistinct(spark: SparkSession, viewPath: String): DataFrame = {
    val meta = readMeta(viewPath)
    read(spark, viewPath)
      .groupBy(meta.groupCols.map(col): _*)
      .agg(
        count(when(col(meta.valueCol).isNotNull, lit(1))).as("n_distinct"),
        sum("freq").as("n_rows"))
  }

  /** Exact interpolated percentiles from the view alone — Spark's
    * `percentile` with its frequency argument builds the identical
    * per-group value->count map a raw-row scan would, so the result
    * is bit-for-bit the row-scan answer. Null values carry no rank
    * weight (freq 0), matching percentile's null-skipping. */
  def servePercentile(spark: SparkSession, viewPath: String,
      qs: Seq[(String, Double)]): DataFrame = {
    val meta = readMeta(viewPath)
    val v = col(meta.valueCol)
    val aggs = qs.map { case (name, q) =>
      percentile(v, lit(q),
        when(v.isNotNull, col("freq")).otherwise(lit(0L))).as(name)
    } ++ Seq(min(v).as("lo"), max(v).as("hi"))
    read(spark, viewPath)
      .groupBy(meta.groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}

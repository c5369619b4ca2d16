package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.AggView

/** The materialized-view serve measured at scale — the A/B behind
  * mb_matview_cdistinct / mb_matview_pctile (the q16 5.8× and q27
  * 4.7× weak rows' at-scale answers):
  *
  *   - q16's grouped COUNT(DISTINCT) shape: the shipped split-distinct
  *     scan plan vs the same answer served from the (group, value,
  *     freq) view;
  *   - q27's exact-percentile shape: the shipped pre-aggregated
  *     percentile scan plan vs `percentile(value, q, freq)` over the
  *     view.
  *
  * View builds are one-time indexing-side costs and reported
  * separately, with view row counts vs base rows — the sizing story
  * (the view is bounded by distinct pairs; its rows/base ratio IS the
  * serve speedup's denominator). A no-op refresh is timed too: the
  * fixed metadata cost every maintenance cycle pays. Every arm's
  * VALUES are asserted equal across paths each rep.
  *
  * Usage: runMain graft.MatViewScale [sfDir] [reps]
  * Prints one JSON line and writes target/matview_scale.json.
  */
object MatViewScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf10")
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warm

    def probe(): Double = {
      val s = System.nanoTime()
      spark.range(1000000).selectExpr("sum(id)").collect()
      (System.nanoTime() - s) / 1e9
    }
    def medianOf(run: => Seq[String]): (Double, Seq[String]) = {
      var v: Seq[String] = Nil
      val ts = (1 to reps).map { _ =>
        System.gc()
        val s = System.nanoTime()
        v = run
        (System.nanoTime() - s) / 1e9
      }.sorted
      (ts(ts.length / 2), v)
    }
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq

    val probeStart = probe()
    val liPath = s"$sfDir/lineitem.parquet"
    val li = spark.read.parquet(liPath)
    val baseRows = li.count()
    val scratch = s"target/scratch/matview-scale/${new java.io.File(sfDir).getName}"

    // ---- one-time view builds over the raw sf layout ----------------
    val viewCols = Seq("l_partkey", "l_suppkey", "l_extendedprice")
    val builds = viewCols.map { c =>
      val vp = s"$scratch/$c"
      val fresh = !new java.io.File(s"$vp/_graft_view").exists()
      val t = System.nanoTime()
      if (fresh) AggView.build(spark, liPath, vp, Seq("l_returnflag"), c)
      val buildSec = (System.nanoTime() - t) / 1e9
      val viewRows = AggView.read(spark, vp).count()
      println(f"[matview-scale] view $c: build $buildSec%.1fs (fresh=$fresh), $viewRows rows vs $baseRows base (${viewRows * 100.0 / baseRows}%.1f%%)")
      c -> (vp, buildSec, viewRows, fresh)
    }.toMap

    // ---- q16 shape: grouped COUNT(DISTINCT) -------------------------
    def q16Scan() = {
      val nRows = li.groupBy("l_returnflag").agg(count(lit(1)).as("n_rows"))
      val nParts = li.select("l_returnflag", "l_partkey").distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_parts"))
      val nSupps = li.select("l_returnflag", "l_suppkey").distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_supps"))
      nRows.join(nParts, "l_returnflag").join(nSupps, "l_returnflag")
        .select(col("l_returnflag"), col("n_parts"), col("n_supps"), col("n_rows"))
    }
    def q16View() = {
      val parts = AggView.serveCountDistinct(spark, builds("l_partkey")._1)
        .select(col("l_returnflag"), col("n_distinct").as("n_parts"), col("n_rows"))
      val supps = AggView.serveCountDistinct(spark, builds("l_suppkey")._1)
        .select(col("l_returnflag"), col("n_distinct").as("n_supps"))
      parts.join(supps, "l_returnflag")
        .select(col("l_returnflag"), col("n_parts"), col("n_supps"), col("n_rows"))
    }
    val (q16ScanSec, q16ScanRows) = medianOf(rows(q16Scan()))
    println(f"[matview-scale] q16 scan: $q16ScanSec%.2fs")
    val (q16ViewSec, q16ViewRows) = medianOf(rows(q16View()))
    println(f"[matview-scale] q16 view: $q16ViewSec%.2fs")
    require(q16ScanRows == q16ViewRows,
      s"q16 diverged:\n${q16ScanRows.mkString("\n")}\nvs\n${q16ViewRows.mkString("\n")}")

    // ---- q27 shape: exact interpolated percentile -------------------
    def q27Scan() =
      li.groupBy("l_returnflag", "l_extendedprice")
        .agg(count(lit(1)).as("freq"))
        .groupBy("l_returnflag")
        .agg(
          percentile(col("l_extendedprice"), lit(0.5), col("freq")).as("p50"),
          percentile(col("l_extendedprice"), lit(0.9), col("freq")).as("p90"),
          min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi"))
    def q27View() =
      AggView.servePercentile(spark, builds("l_extendedprice")._1,
          Seq("p50" -> 0.5, "p90" -> 0.9))
        .select(col("l_returnflag"), col("p50"), col("p90"), col("lo"), col("hi"))
    val (q27ScanSec, q27ScanRows) = medianOf(rows(q27Scan()))
    println(f"[matview-scale] q27 scan: $q27ScanSec%.2fs")
    val (q27ViewSec, q27ViewRows) = medianOf(rows(q27View()))
    println(f"[matview-scale] q27 view: $q27ViewSec%.2fs")
    require(q27ScanRows == q27ViewRows,
      s"q27 diverged:\n${q27ScanRows.mkString("\n")}\nvs\n${q27ViewRows.mkString("\n")}")

    // ---- maintenance fixed cost: a no-op refresh --------------------
    val tR = System.nanoTime()
    val refreshed = AggView.refresh(spark, liPath, builds("l_partkey")._1)
    val refreshNoopSec = (System.nanoTime() - tR) / 1e9
    require(!refreshed, "no-op refresh must report no new files")

    val probeEnd = probe()
    val buildJson = viewCols.map { c =>
      val (_, sec, vr, fresh) = builds(c)
      s""""build_$c":{"sec":$sec,"fresh":$fresh,"view_rows":$vr}"""
    }.mkString(",")
    val line =
      s"""{"bench":"matview_scale","sf":"$sfDir","reps":$reps,"base_rows":$baseRows,""" +
        s""""probe_start_sec":$probeStart,"probe_end_sec":$probeEnd,""" +
        buildJson + "," +
        s""""q16_scan_sec":$q16ScanSec,"q16_view_sec":$q16ViewSec,""" +
        s""""q27_scan_sec":$q27ScanSec,"q27_view_sec":$q27ViewSec,""" +
        s""""refresh_noop_sec":$refreshNoopSec}"""
    println(line)
    try {
      val out = java.nio.file.Paths.get("target/matview_scale.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, line.getBytes)
    } catch { case scala.util.control.NonFatal(_) => }
    spark.stop()
  }
}

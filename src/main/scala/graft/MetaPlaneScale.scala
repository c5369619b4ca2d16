package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FILE-COUNT stress for the metadata plane (round 14, verdict #3).
  *
  * Every serve layer's decision path is O(files): a distributed
  * tri-state/skip-list job over the sidecar plus a driver-side collect
  * of per-file verdicts. That is constant in DATA size but linear in
  * FILE count — fine at the 64–256 files the sf100 ledgers use,
  * unproven at the 10⁴–10⁵ files a real 100 TB table has. This bench
  * proves (or breaks) the curve:
  *
  *   1. REAL layouts of N ∈ {1k, 5k, 20k} parquet files (tiny rows —
  *      the metadata plane costs what it costs regardless of file
  *      size): sidecar build (N footer reads), cold transparent
  *      zone-agg PLAN time, warm plan time (memoized decisions),
  *      zone skip-list decision, top-k cut decision, and the driver
  *      heap delta across the whole per-N block.
  *   2. SYNTHETIC index frames of {100k, 1M} (file × column) entries —
  *      file counts too big to materialize as real files here — timing
  *      the distributed decisions alone (fileTriState, skippedFiles),
  *      whose collect is bounded by the per-file verdict lists.
  *
  * One JSON line; target/metaplane.json. Usage:
  *   runMain graft.MetaPlaneScale [maxRealFiles]
  */
object MetaPlaneScale {

  private def timeOnce(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  private def heapMb(): Double = {
    System.gc()
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / 1e6
  }

  def main(args: Array[String]): Unit = {
    val maxReal = if (args.nonEmpty) args(0).toInt else 20000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val real = Seq(1000, 5000, 20000).filter(_ <= maxReal).map { n =>
      val out = s"target/scratch/metaplane/files$n"
      val p = java.nio.file.Paths.get(out, "_SUCCESS")
      if (!java.nio.file.Files.exists(p)) {
        // n files, ~100 id-clustered rows each: the id ranges are
        // disjoint per file, so zone predicates decide most files
        spark.range(n * 100L).select(col("id"),
          (col("id") % 7).as("v"))
          .repartitionByRange(n, col("id"))
          .sortWithinPartitions("id")
          .write.mode("overwrite").parquet(out)
      }
      val h0 = heapMb()
      val buildSec = timeOnce {
        graft.sources.MicroBlockIndex.saveSidecar(
          graft.sources.MicroBlockIndex.build(spark, out, s"mp$n"), out)
      }
      graft.sources.SidecarManifest.invalidateAll()
      spark.read.parquet(out).createOrReplaceTempView(s"mp_$n")
      val half = n * 50L
      val q = s"SELECT COUNT(*) AS c FROM mp_$n WHERE id >= $half"
      // COLD plan: discovery probe + sidecar load + tri-state job +
      // snapshot job, everything a fresh session pays once
      var df: DataFrame = null
      val coldPlanSec = timeOnce {
        df = spark.sql(q); df.queryExecution.optimizedPlan
      }
      val servedCold = graft.plans.ZoneAggRule.servedSignature(
        df.queryExecution.optimizedPlan)
      // WARM plan: memoized decisions, same shape
      val warmPlanSec = timeOnce {
        spark.sql(q).queryExecution.optimizedPlan
      }
      val execSec = timeOnce { spark.sql(q).collect() }
      // the plain zone skip-list decision (ZoneMapPruneRule's job)
      val idx = spark.read.parquet(
        graft.sources.MicroBlockIndex.sidecarPath(out))
      val pred = graft.plans.Cmp(">=", "id",
        graft.plans.PredValue(half.toDouble))
      var skipped = 0
      val skipSec = timeOnce {
        skipped = graft.plans.IndexPruning.skippedFiles(idx, pred).size
      }
      val triSec = timeOnce {
        graft.plans.IndexPruning.fileTriState(idx, pred).collect()
      }
      var topkCut = 0
      val topkSec = timeOnce {
        topkCut = graft.plans.IndexPruning.topKSkippedFiles(
          idx, "id", 10, ascending = false, nullsFirst = false).size
      }
      val heapDelta = heapMb() - h0
      require(servedCold, s"n=$n: the cold serve must fire")
      require(skipped > n / 3, s"n=$n: fixture must be mostly decidable")
      s"""{"files":$n,"index_build_sec":$buildSec,"cold_plan_sec":$coldPlanSec,""" +
        s""""warm_plan_sec":$warmPlanSec,"exec_sec":$execSec,""" +
        s""""zone_skip_sec":$skipSec,"skipped":$skipped,""" +
        s""""tristate_sec":$triSec,"topk_sec":$topkSec,"topk_cut":$topkCut,""" +
        s""""driver_heap_delta_mb":$heapDelta}"""
    }

    // synthetic frames: distributed-decision scaling past real-file
    // practicality — entries = files × 2 columns
    val synth = Seq(50000, 500000).map { files =>
      val idx = spark.range(files.toLong).select(
        col("id").cast("int").as("blockId"),
        concat(lit("s"), col("id")).as("file"),
        lit("t").as("table"),
        (col("id") * 100).as("rowStart"), (col("id") * 100 + 99).as("rowEnd"),
        explode(array(lit("id"), lit("v"))).as("column"),
        lit(100L).as("rows"), lit(0L).as("nullCount"),
        lit(1000L).as("bytes"), lit("SNAPPY").as("codec"),
        (col("id") * 100.0).as("minNum"), (col("id") * 100.0 + 99).as("maxNum"),
        lit(null).cast("string").as("minStr"), lit(null).cast("string").as("maxStr"),
        (col("id") * 100).as("minLong"), (col("id") * 100 + 99).as("maxLong"),
        lit(false).as("nanRisk"), lit(null).cast("long").as("sumLong"))
      val pred = graft.plans.Cmp(">=", "id",
        graft.plans.PredValue(files * 50.0))
      var skipped = 0
      val skipSec = timeOnce {
        skipped = graft.plans.IndexPruning.skippedFiles(idx, pred).size
      }
      val triSec = timeOnce {
        graft.plans.IndexPruning.fileTriState(idx, pred).collect()
      }
      s"""{"files":$files,"zone_skip_sec":$skipSec,"skipped":$skipped,"tristate_sec":$triSec}"""
    }

    // round 15 — the footer sweep's PARALLELISM (the r14 verdict's
    // "141 s at 20k files is linear but serial-ish"): the same build
    // pinned to 1 task vs the auto partitioning. Build time must
    // scale with files/cores, not files. Plus the INCREMENTAL path: a
    // 1% append refreshed (footers + per-file sums for the delta
    // only) vs the monolithic rebuild a million-file table must never
    // pay.
    val sweep = {
      val n = Seq(1000, 5000, 20000).filter(_ <= maxReal)
        .filter(_ <= 5000).max // serial at 20k would run ~2 min
      val out = s"target/scratch/metaplane/files$n"
      spark.conf.set("spark.graft.index.buildPartitions", "1")
      val serialSec = timeOnce {
        graft.sources.MicroBlockIndex.build(spark, out, "mp_sweep").count()
      }
      spark.conf.unset("spark.graft.index.buildPartitions")
      val parSec = timeOnce {
        graft.sources.MicroBlockIndex.build(spark, out, "mp_sweep").count()
      }
      // incremental: land a 1% delta, refresh (footers + sums of the
      // delta only), then restore the fixture
      val base = graft.sources.MicroBlockIndex.withSums(spark, out,
        graft.sources.MicroBlockIndex.build(spark, out, "mp_sweep"),
        Seq("v")).cache()
      base.count()
      val delta = math.max(1, n / 100)
      val stage = s"$out-delta-stage"
      spark.range(n * 100L, n * 100L + delta * 100L)
        .select(col("id"), (col("id") % 7).as("v"))
        .repartitionByRange(delta, col("id"))
        .write.mode("overwrite").parquet(stage)
      val outDir = new java.io.File(out)
      val moved = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).zipWithIndex.map {
          case (f, i) =>
            val dst = new java.io.File(outDir, f"delta-$i%05d.parquet")
            java.nio.file.Files.move(f.toPath, dst.toPath)
            dst
        }
      val refreshSec = timeOnce {
        graft.sources.MicroBlockIndex.refresh(spark, out, "mp_sweep", base)
          .count()
      }
      moved.foreach(_.delete()) // restore the fixture
      base.unpersist()
      s"""{"sweep_files":$n,"build_serial_sec":$serialSec,""" +
        s""""build_parallel_sec":$parSec,""" +
        s""""parallel_speedup":${serialSec / math.max(parSec, 1e-9)},""" +
        s""""delta_files":$delta,"refresh_delta_sec":$refreshSec,""" +
        s""""refresh_vs_rebuild":${refreshSec / math.max(parSec, 1e-9)}}"""
    }

    val line =
      s"""{"bench":"metaplane","cpus":$cpus,"real":[${real.mkString(",")}],""" +
        s""""sweep":$sweep,""" +
        s""""synthetic_index":[${synth.mkString(",")}]}"""
    println(line)
    val outP = java.nio.file.Paths.get("target/metaplane.json")
    java.nio.file.Files.createDirectories(outP.getParent)
    java.nio.file.Files.write(outP,
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}

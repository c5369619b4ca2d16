package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The `maxScanFraction` gate, measured instead of guessed (round 14,
  * verdict #8): the stats serve refuses when more than a fixed 0.5 of
  * the live files would scan anyway. This sweep measures the ACTUAL
  * serve-vs-scan crossover as a function of the straddler fraction.
  *
  * Layout per fraction f: F files of equal row count, (1−f)·F
  * id-clustered (a cut predicate decides them) and f·F with
  * full-range shuffled ids (they straddle every cut). The same
  * `COUNT(*)/SUM WHERE id >= cut` runs as a plain scan (no sidecar)
  * and as the serve (sidecar present, gate forced open with
  * maxScanFraction=1.0), so the artifact shows serve_sec/scan_sec per
  * fraction — the crossover is where the ratio hits 1.
  *
  * Usage: runMain graft.ZoneAggFractionScale <sfDir> [files] [reps]
  * Writes target/zoneagg_fraction.json.
  */
object ZoneAggFractionScale {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ZoneAggFractionScale <sfDir> [files] [reps]")
    val sfDir = args(0)
    val nFiles = if (args.length > 1) args(1).toInt else 32
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    BenchWindow.satProbe(spark)

    // synthetic rows at the sf's lineitem volume: the sweep prices
    // scan-vs-serve BYTES, and contiguous ids make the straddler
    // construction exact
    val total = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val src = spark.range(total).select(col("id"),
      (col("id") % 97).as("l_suppkey"),
      (col("id") % 50 * 1.0).as("l_quantity"))
    val sfName = new java.io.File(sfDir).getName
    spark.conf.set("spark.graft.statsServe.maxScanFraction", "1.0")

    val fractions = Seq(0.0, 0.125, 0.25, 0.5, 0.75)
    val rows = fractions.map { f =>
      val straddlers = math.round(f * nFiles).toInt
      val clustered = nFiles - straddlers
      val out = s"target/scratch/zoneaggfrac/$sfName/f$straddlers"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "_SUCCESS"))) {
        // straddler rows are every Nth id — each straddler file spans
        // the WHOLE id range (undecidable under any cut); the rest
        // range-cluster into decided files
        src.filter(pmod(col("id"), lit(nFiles)) >= straddlers)
          .repartitionByRange(math.max(1, clustered), col("id"))
          .sortWithinPartitions("id")
          .write.mode("overwrite").parquet(out)
        if (straddlers > 0)
          src.filter(pmod(col("id"), lit(nFiles)) < straddlers)
            .repartition(straddlers)
            .write.mode("append").parquet(out)
      }
      val sidecar = new org.apache.hadoop.fs.Path(
        graft.sources.MicroBlockIndex.sidecarPath(out))
      val fs = sidecar.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(sidecar, true)
      graft.sources.SidecarManifest.invalidateAll()
      spark.read.parquet(out).createOrReplaceTempView(s"zf_$straddlers")
      // the mid-range cut decides every clustered file (bar one
      // boundary file) and no straddler
      val cut = total / 2
      val q = s"""SELECT COUNT(*) AS n, COUNT(l_suppkey) AS ns
        |FROM zf_$straddlers WHERE id >= $cut""".stripMargin
      def served(df: org.apache.spark.sql.DataFrame): Boolean =
        graft.plans.ZoneAggRule.servedSignature(df.queryExecution.optimizedPlan)
      def med(): (Double, String) = {
        var v = ""
        val ts = (1 to reps).map { _ =>
          spark.catalog.clearCache(); System.gc()
          val t0 = System.nanoTime()
          v = spark.sql(q).collect().mkString
          (System.nanoTime() - t0) / 1e9
        }.sorted
        (ts(ts.size / 2), v)
      }
      require(!served(spark.sql(q)), "scan arm must not see a sidecar")
      val (scanSec, vScan) = med()
      graft.sources.MicroBlockIndex.saveSidecar(
        graft.sources.MicroBlockIndex.build(spark, out, s"zf$straddlers"), out)
      require(served(spark.sql(q)),
        s"serve must fire at straddler fraction $f (gate forced open)")
      val (serveSec, vServe) = med()
      require(vScan == vServe, s"arms diverged at f=$f")
      s"""{"fraction":$f,"straddler_files":$straddlers,"files":$nFiles,""" +
        s""""scan_sec":$scanSec,"serve_sec":$serveSec,""" +
        s""""ratio":${serveSec / scanSec}}"""
    }

    val sat = BenchWindow.satProbe(spark)
    val line =
      s"""{"bench":"zoneagg_fraction","sf":"$sfDir","files":$nFiles,""" +
        s""""reps":$reps,"sat_probe_sec":$sat,"sweep":[${rows.mkString(",")}]}"""
    println(line)
    val outP = java.nio.file.Paths.get("target/zoneagg_fraction.json")
    java.nio.file.Files.createDirectories(outP.getParent)
    java.nio.file.Files.write(outP,
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.{And, Between, IndexPruning, Pred, PredValue}
import graft.sources.{MicroBlockIndex, MicroBlockWriter}

/** Wall-time A/B for Z-order clustering at a scale where pruning pays
  * (see mb_zorder for the file-count scoreboard at sf0.01): the same
  * two-dimensional predicate served by (a) a full raw scan, (b) the
  * zone-map-pruned single-key layout, (c) the zone-map-pruned
  * z-ordered layout. Timings INCLUDE the pruning decision (the honest
  * serving cost: decide + scan). Run after `ScaleData` has produced
  * the sf dir.
  *
  * Usage: runMain graft.ZOrderScale [sfDir] [reps] [blocks]
  * Prints one JSON line and writes target/zorder_scale.json.
  */
object ZOrderScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val blocks = if (args.length > 2) args(2).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warm

    val raw = s"$sfDir/lineitem.parquet"
    val linPath = s"target/scratch/zorder-scale/linear-$blocks"
    val zPath = s"target/scratch/zorder-scale/z-$blocks"
    val fs = new org.apache.hadoop.fs.Path(linPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def haveDone(p: String) =
      fs.exists(new org.apache.hadoop.fs.Path(p + "/_SUCCESS"))
    val t0 = System.nanoTime()
    if (!haveDone(linPath))
      MicroBlockWriter.write(spark.read.parquet(raw), linPath, "l_quantity", blocks)
    if (!haveDone(zPath))
      MicroBlockWriter.writeZOrdered(spark.read.parquet(raw), zPath,
        Seq("l_quantity", "l_extendedprice"), blocks)
    val buildSec = (System.nanoTime() - t0) / 1e9

    val linIdx = MicroBlockIndex.build(spark, linPath, "lin").toDF.cache()
    val zIdx = MicroBlockIndex.build(spark, zPath, "z").toDF.cache()
    linIdx.count(); zIdx.count()

    val price = Between("l_extendedprice", PredValue(20000L), PredValue(26000L))
    val both = And(Between("l_quantity", PredValue(11L), PredValue(13L)), price)

    def rowFilter(p: Pred): org.apache.spark.sql.Column = p match {
      case And(l, r) => rowFilter(l) && rowFilter(r)
      case Between(c, lo, hi) => col(c).between(lo.num.get, hi.num.get)
      case other => throw new IllegalArgumentException(other.toString)
    }

    def time(body: => Long): (Double, Long) = {
      val s = System.nanoTime(); val n = body
      ((System.nanoTime() - s) / 1e9, n)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    // each serving mode counts matching rows; pruned modes pay the
    // decision query INSIDE the timed region
    def fullScan(p: Pred) = time {
      spark.read.parquet(raw).filter(rowFilter(p)).count()
    }
    def pruned(idx: DataFrame, path: String, p: Pred) = time {
      val kept = IndexPruning.keptFiles(idx, p)
      spark.read.parquet(kept: _*).filter(rowFilter(p)).count()
    }

    val results = for {
      (pname, p) <- Seq("price" -> price, "both" -> both)
      (mode, run) <- Seq[(String, () => (Double, Long))](
        "raw_full" -> (() => fullScan(p)),
        "linear_pruned" -> (() => pruned(linIdx, linPath, p)),
        "zorder_pruned" -> (() => pruned(zIdx, zPath, p)))
    } yield {
      val runs = (1 to reps).map(_ => run())
      val rows = runs.head._2
      require(runs.forall(_._2 == rows), s"row drift in $mode/$pname")
      val files = if (mode == "raw_full") -1L else {
        val idx = if (mode == "linear_pruned") linIdx else zIdx
        IndexPruning.keptFiles(idx, p).size.toLong
      }
      (pname, mode, median(runs.map(_._1)), rows, files)
    }

    val entries = results.map { case (pn, m, sec, rows, files) =>
      s""""${pn}_$m":{"sec":$sec,"rows":$rows,"files":$files}"""
    }.mkString(",")
    val line =
      s"""{"metric":"zorder_ab","sf":"$sfDir","blocks":$blocks,"reps":$reps,"build_sec":$buildSec,$entries}"""
    println(line)
    val out = java.nio.file.Paths.get("target/zorder_scale.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}

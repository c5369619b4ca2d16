package graft

import org.apache.spark.sql.SparkSession

/** Artifact driver for the prefetch-loop A/B
  * ([[graft.engine.PrefetchLoopBench]]): the reference's
  * run_with_prefetch_loop.py + benchmark.py experiment as one measured
  * JSON line — prediction → warmer cache → faster queries, per model
  * class, with the unpredictable-workload control alongside.
  *
  * Usage: runMain graft.PrefetchAB [reps]
  * (SPARK_GRAFT_SF_DIR selects the table, default sf0.1.)
  * Writes target/prefetch_ab.json.
  */
object PrefetchAB {

  private def timeOnce(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  /** Core-saturating noise canary (Bench.scala's): a sick measurement
    * window must be self-evident from the artifact. */
  private def satProbe(spark: SparkSession): Double =
    timeOnce {
      val p = spark.sparkContext.defaultParallelism
      spark.range(0, 32000000L, 1, p)
        .selectExpr("id % 1048576 AS k")
        .groupBy("k").count()
        .selectExpr("sum(count)").collect()
    }

  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warm-up
    satProbe(spark) // codegen warm-up for the probe itself

    // A FRESH engine (not the memoized engineFor one): the A/B needs
    // its own clean access log, and a cache capacity BELOW the
    // 16-file working set so the OFF arm keeps missing at steady
    // state — see PrefetchLoopBench's honesty rules.
    val capacity = 6
    val (trainPasses, evalPasses, topK, historyLen) = (2, 3, 4, 4)
    val path = graft.queries.MicroBlockQueries.microPath(spark, sfDir)
    val engine = new graft.engine.GraftEngine(
      spark, path, "lineitem", cacheCapacity = capacity)
    val cycle = graft.queries.MicroBlockQueries.workload.distinct

    val satStart = satProbe(spark)
    val rows = graft.engine.PrefetchLoopBench.run(
      spark, engine, cycle, trainPasses = trainPasses, evalPasses = evalPasses,
      reps = reps, topK = topK, historyLen = historyLen)
    val satMid = satProbe(spark)
    // the OVERLAPPED experiment: warming on the service's background
    // thread during think-time gaps, end-to-end wall time reported —
    // two think-times so a negative result still locates the crossover
    val overlapped = Seq(100L, 250L).flatMap(t =>
      graft.engine.PrefetchLoopBench.runOverlapped(
        spark, engine, cycle, trainPasses = 1, evalPasses = evalPasses,
        reps = reps, topK = topK, historyLen = historyLen, thinkMs = t))
    val satEnd = satProbe(spark)

    val line =
      s"""{"sf":"$sfDir","reps":$reps,"stat":"median_rep","cache_capacity":$capacity,""" +
        s""""files_total":${engine.blocks.map(_.file).distinct.size},""" +
        s""""topk":$topK,"history_len":$historyLen,""" +
        s""""train_passes":$trainPasses,"eval_passes":$evalPasses,""" +
        s""""sat_probe_start_sec":$satStart,"sat_probe_mid_sec":$satMid,""" +
        s""""sat_probe_end_sec":$satEnd,""" +
        s""""arms":${graft.engine.PrefetchLoopBench.toJson(rows)},""" +
        s""""overlapped":${graft.engine.PrefetchLoopBench.toJsonOverlapped(overlapped)}}"""
    println(line)
    val out = java.nio.file.Paths.get("target/prefetch_ab.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 q1_agg lever sweep (VERDICT r9 ask #1): separate
  * measurement noise from plan cost, then A/B the cheap levers —
  * scan-split size (`spark.sql.files.maxPartitionBytes`), shuffle
  * width for the 6-group aggregate, and the DECIMAL(18,s) sum path
  * vs [[graft.queries.Det.dsum2L]]'s long-buffer exact sums — all in
  * ONE session back-to-back, canary probes embedded, so every ratio
  * in the artifact comes from the same measurement window.
  *
  * Usage: runMain graft.Q1Sweep [sfDir] [reps]   (default target/sf100 5)
  * Writes target/q1_sweep.json.
  */
object Q1Sweep {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf100")
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warm

    def satProbe(): Double = {
      val p = spark.sparkContext.defaultParallelism
      val t0 = System.nanoTime()
      spark.range(0, 32000000L, 1, p)
        .selectExpr("id % 1048576 AS k")
        .groupBy("k").count()
        .selectExpr("sum(count)").collect()
      (System.nanoTime() - t0) / 1e9
    }

    def timed(run: => Unit): Double = {
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        run
        (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.size / 2)
    }

    val li = () => spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_shipdate") <= "1998-09-02 00:00:00")
      .groupBy("l_returnflag", "l_linestatus")

    import graft.queries.Det._
    def q1Dec(): DataFrame = li().agg(
      dsum2(col("l_quantity")).as("sum_qty"),
      dsum2(col("l_extendedprice")).as("sum_base_price"),
      dsum4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
      davg2(col("l_quantity")).as("avg_qty"),
      count(lit(1)).as("count_order"))
    def q1Long(): DataFrame = li().agg(
      dsum2L(col("l_quantity")).as("sum_qty"),
      dsum2L(col("l_extendedprice")).as("sum_base_price"),
      dsum4L(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
      davg2L(col("l_quantity")).as("avg_qty"),
      count(lit(1)).as("count_order"))
    def q1Double(): DataFrame = li().agg(
      sum("l_quantity"), sum("l_extendedprice"),
      sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
      avg("l_quantity"), count(lit(1)))
    def probe(): Unit = { spark.read.parquet(s"$sfDir/lineitem.parquet").count(); () }

    // correctness first: the long-buffer path must be value-identical
    // to the decimal path (sorted rows, exact doubles) or it is not a
    // lever at all
    val a = q1Dec().orderBy("l_returnflag", "l_linestatus").collect()
    val b = q1Long().orderBy("l_returnflag", "l_linestatus").collect()
    require(a.sameElements(b),
      s"long-buffer sums diverged from decimal sums:\n${a.mkString("\n")}\nvs\n${b.mkString("\n")}")
    println(s"""{"q1_long_equals_dec":true,"groups":${a.length}}""")

    val satStart = satProbe()
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    results("probe_count_star") = timed(probe())
    // scan-split sweep x sum-path sweep
    for (mpb <- Seq(32, 64, 128, 256)) {
      spark.conf.set("spark.sql.files.maxPartitionBytes", s"${mpb}m")
      results(s"q1_dec_mpb$mpb") = timed(q1Dec().count())
      results(s"q1_long_mpb$mpb") = timed(q1Long().count())
      if (mpb == 128) results(s"q1_double_mpb$mpb") = timed(q1Double().count())
    }
    spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
    // shuffle width for the 6-group agg (partial agg reduces to 6
    // rows per task; the exchange is tiny either way — measured to
    // close the lever, not because it should matter)
    for (sp <- Seq(8, 64)) {
      spark.conf.set("spark.sql.shuffle.partitions", sp)
      results(s"q1_long_shuf$sp") = timed(q1Long().count())
    }
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    val satEnd = satProbe()

    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val line = s"""{"bench":"q1_sweep","sf":"$sfDir","reps":$reps,""" +
      s""""sat_probe_start_sec":$satStart,"sat_probe_end_sec":$satEnd,""" +
      s""""graft_sec":$qs}"""
    println(line)
    val out = java.nio.file.Paths.get("target/q1_sweep.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (round 17): q16_count_distinct was the worst honest sf100
  * ledger row (33.4 s cold / 11.0 s warm vs DuckDB 3.6 s). The declared
  * plan runs THREE branches (distinct-pairs ×2 + count), i.e. three
  * scans of lineitem. Candidate: ONE scan through a 2-set GROUPING SETS
  * expand — (flag, partkey) and (flag, suppkey) pre-aggregate in one
  * pass, the row total rides the partkey branch's pair counts. Rows
  * asserted identical. Arms interleave; optional page-cache drop
  * (SPARK_GRAFT_DROPCACHE=1, needs root) before each rep for honest
  * cold numbers. Not a driver surface. */
object Q16Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf100")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def dropCache(): Unit =
      if (sys.env.contains("SPARK_GRAFT_DROPCACHE")) {
        try {
          val p = new java.io.PrintWriter("/proc/sys/vm/drop_caches")
          p.write("3"); p.close()
        } catch { case t: Throwable => System.err.println(s"drop_caches: $t") }
      }

    def declared() = SparkEntry.queries("q16_count_distinct")(spark, sfDir)

    def singleScan() = {
      graft.engine.Tables.load(spark, sfDir, "lineitem")
        .createOrReplaceTempView("q16p_li")
      spark.sql(
        """WITH pairs AS (
          |  SELECT l_returnflag, l_partkey, l_suppkey,
          |         grouping(l_partkey) AS g_part, COUNT(1) AS cnt
          |  FROM q16p_li
          |  GROUP BY GROUPING SETS ((l_returnflag, l_partkey),
          |                          (l_returnflag, l_suppkey))
          |)
          |SELECT l_returnflag,
          |  COUNT(CASE WHEN g_part = 0 AND l_partkey IS NOT NULL THEN 1 END) AS n_parts,
          |  COUNT(CASE WHEN g_part = 1 AND l_suppkey IS NOT NULL THEN 1 END) AS n_supps,
          |  SUM(CASE WHEN g_part = 0 THEN cnt ELSE 0 END) AS n_rows
          |FROM pairs GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }

    // row identity first (cheap at whatever sf)
    val a = declared().collect().map(_.toString).toSeq
    val b = singleScan().collect().map(_.toString).toSeq
    println(s"[q16] rows identical=${a == b} (${a.mkString(" | ")})")
    val plan = singleScan().queryExecution.executedPlan.toString
    println(s"[q16] single-scan plan Expand=${plan.contains("Expand")} " +
      s"scans=${plan.linesIterator.count(_.contains("FileScan"))}")

    def timed(label: String)(body: => Unit): Double = {
      spark.catalog.clearCache(); System.gc(); dropCache()
      val t0 = System.nanoTime(); body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[q16] $label: $s%.2fs"); s
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    for (i <- 1 to reps) {
      timed(s"declared(3-branch) rep$i")(sink(declared()))
      timed(s"single-scan(gsets) rep$i")(sink(singleScan()))
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one named query in isolation, repeated.
  * Usage: runMain graft.TimeQuery <name> <sfDir> [reps]
  * (Bench totals on this machine carry external-load noise; isolated
  * repeats are the trustworthy signal — see ROUND_NOTES.md.)
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    // same env + fallback as Bench so isolated timings are comparable
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warm
    val q = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = q(spark, sfDir).count()
      println(f"[time] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}

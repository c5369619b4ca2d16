package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (round 17): can the q51 recursive CTE unroll TWO halving
  * steps per UnionLoop iteration (halving Spark's per-iteration job
  * overhead) while emitting the exact same rows? Compares row sets and
  * counts jobs for both formulations. Not a driver surface. */
object Q51Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.engine.Tables.load(spark, sfDir, "customer")
      .createOrReplaceTempView("q51_customer")

    val oldSql =
      """WITH RECURSIVE anc(c_custkey, ancestor, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM q51_customer
        |  UNION ALL
        |  SELECT c_custkey, ancestor DIV 2, depth + 1 FROM anc WHERE ancestor > 1
        |)
        |SELECT c_custkey, CAST(MAX(depth) AS INT) AS depth,
        |  COUNT(*) AS n_ancestors
        |FROM anc GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

    def jobsAndTime(sql: String): (Long, Double, Long) = {
      val sc = spark.sparkContext
      val before = sc.statusTracker.getJobIdsForGroup(null).length
      var jobs = 0L
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      }
      sc.addSparkListener(listener)
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      spark.sql(sql).write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let job-start events drain
      sc.removeSparkListener(listener)
      (jobs, sec, before)
    }

    // row identity first: the old single-step recursion vs the
    // DECLARED query (now the 4-step unroll in RelationalQueries)
    def declared() = SparkEntry.queries("q51_recursive")(spark, sfDir)
    val a = spark.sql(oldSql).collect().map(_.toString)
    val b = declared().collect().map(_.toString)
    println(s"[q51] rows old=${a.length} new=${b.length} identical=${a.sameElements(b)}")
    val plan = declared().queryExecution.executedPlan.toString
    println(s"[q51] new plan has UnionLoop=${plan.contains("UnionLoop")}")
    def jobsAndTimeDf(body: => Unit): (Long, Double) = {
      val sc = spark.sparkContext
      var jobs = 0L
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      }
      sc.addSparkListener(listener)
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      sc.removeSparkListener(listener)
      (jobs, sec)
    }
    for (i <- 1 to 3) {
      val (jo, to, _) = jobsAndTime(oldSql)
      val (jn, tn) = jobsAndTimeDf(
        declared().write.mode("overwrite").format("noop").save())
      println(f"[q51] rep$i old: $jo jobs ${to}%.2fs | new: $jn jobs ${tn}%.2fs")
    }
    spark.stop()
  }
}

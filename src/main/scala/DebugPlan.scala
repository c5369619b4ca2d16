object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Bucketing.registerExisting(spark, "li_bkt", "l_orderkey", 128)
    graft.sources.Bucketing.registerExisting(spark, "ord_bkt", "o_orderkey", 128)
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val sfDir = "target/sf100"
    spark.read.parquet(s"$wh/li_bkt").createOrReplaceTempView("li_v")
    spark.read.parquet(s"$wh/ord_bkt").createOrReplaceTempView("ord_v")
    spark.read.parquet(s"$sfDir/customer.parquet").createOrReplaceTempView("p_cust")
    spark.read.parquet(s"$sfDir/nation.parquet").createOrReplaceTempView("p_nation")
    spark.read.parquet(s"$sfDir/region.parquet").createOrReplaceTempView("p_region")
    val fullSql = """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM li_v JOIN ord_v ON l_orderkey = o_orderkey
      |JOIN p_cust ON o_custkey = c_custkey
      |JOIN p_nation ON c_nationkey = n_nationkey
      |JOIN p_region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY r_name, n_name""".stripMargin
    val df = spark.sql(fullSql)
    val phys = df.queryExecution.executedPlan
    println("EXCHANGES=" + phys.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e.outputPartitioning.toString.take(60)
    }.mkString(" | "))
    println(phys.treeString.take(6000))
    spark.stop()
  }
}

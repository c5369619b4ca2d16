package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 17): where does dict_ab's point_auto spend its
  * extra ~0.15 s over point_scan after routing to "scan"? Times each
  * candidate component in isolation. Not a driver surface. */
object DictProbe {
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

    val (path, dIdx) = graft.queries.MicroBlockQueries.dictBucketIndex(spark, sfDir)
    val files = graft.sources.MicroBlockIndex.listParquetFiles(path)
    val v = graft.plans.PredValue(3L)
    def fp(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(count(lit(1)), sum(col("l_linenumber"))).first.getLong(0)
    def med(label: String)(run: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val s = System.nanoTime(); run; (System.nanoTime() - s) / 1e9
      }.sorted
      println(f"[probe] $label%-40s median=${ts(2)}%.4f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    // the two bench arms, verbatim
    med("scan: read(files:_*) === 3")(
      fp(spark.read.parquet(files: _*).filter(col("l_suppkey") === 3)))
    med("auto: prunedReadEqAuto")(
      fp(graft.sources.DictionaryIndex.prunedReadEqAuto(spark, dIdx, path, "l_suppkey", Seq(v))))
    // components
    med("tableBytes only")(
      graft.sources.DictionaryIndex.tableBytes(path))
    med("read(dir) === 3")(
      fp(spark.read.parquet(path).filter(col("l_suppkey") === 3)))
    med("read(dir) Cmp.toColumn")(
      fp(spark.read.parquet(path).filter(graft.plans.Cmp("=", "l_suppkey", v).toColumn)))
    med("read(files:_*) Cmp.toColumn")(
      fp(spark.read.parquet(files: _*).filter(graft.plans.Cmp("=", "l_suppkey", v).toColumn)))
    // pushed-filter audit: does the double literal defeat pushdown?
    val planInt = spark.read.parquet(path).filter(col("l_suppkey") === 3)
      .queryExecution.executedPlan.toString
    val planCmp = spark.read.parquet(path).filter(graft.plans.Cmp("=", "l_suppkey", v).toColumn)
      .queryExecution.executedPlan.toString
    println("[probe] int-literal PushedFilters: " +
      planInt.linesIterator.filter(_.contains("PushedFilters")).take(1).mkString)
    println("[probe] Cmp-double PushedFilters: " +
      planCmp.linesIterator.filter(_.contains("PushedFilters")).take(1).mkString)
    spark.stop()
  }
}

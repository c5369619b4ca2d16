package graft.engine

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Mirrors the role of the reference engine's constructor setup
  * (reference: query_enginev5.py:31-60 — one DuckDB connection + one
  * parquet handle per engine); here the session carries the scale knobs
  * that matter on a real cluster: AQE (runtime re-planning + skew-join
  * splitting), broadcast-join threshold, and shuffle parallelism sized
  * to cores rather than Spark's default 200.
  */
object GraftSession {

  /** Apply graft's standard configuration to an existing builder. */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.sql.parquet.aggregatePushdown", "true")
    // trust bucketed tables' written sort order (off by default since
    // Spark 3.0): with Bucketing's one-file-per-bucket writes this
    // removes the per-partition re-sort under co-located merge joins,
    // making them pure streaming merges
    .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    .config("spark.sql.ui.explainMode", "formatted")

  /** Local session for tests/benchmarks. `cores` threads, shuffle
    * partitions matched to cores (not 200 — local mode has one JVM);
    * graft's extensions (SQL functions + zone-map rule) installed. */
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val s = tune(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName(appName)
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.warehouse.dir", "target/scratch/warehouse")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions)
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

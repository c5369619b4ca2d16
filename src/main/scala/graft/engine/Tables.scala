package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loading. The reference engine binds one parquet file per
  * engine instance as a named view (reference: query_enginev5.py:55-60);
  * graft binds the whole star schema as temp views so `spark.sql` can
  * address any table.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir) else spark.read.parquet(path(dir, name))

  /** events.ts is TIMESTAMP(NANOS) in parquet, which Spark's vectorized
    * reader rejects. Read it as raw nanos (legacy conf) and surface a
    * microsecond TIMESTAMP column — same wall-clock under the UTC
    * session as DuckDB's nanosecond-truncated naive timestamp. */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.streaming.EventStreams.normalizeTs(spark.read.parquet(path(dir, "events")))
  }

  /** Register every test table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

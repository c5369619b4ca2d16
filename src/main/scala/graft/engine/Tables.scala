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

  /** events.ts encoding varies across testdata generations (int64
    * epoch-nanos vs native timestamp[us]/NTZ). Keep the nanos legacy
    * conf on (harmless otherwise) and let [[EventStreams.normalizeTs]]
    * branch on the actual file schema — same wall-clock under the UTC
    * session as DuckDB's naive-timestamp read either way. */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.streaming.EventStreams.normalizeTs(spark.read.parquet(path(dir, "events")))
  }

  /** Format-agnostic read (north-star parity: "Parquet/ORC"). Parquet
    * and ORC share Spark's vectorized columnar reader, predicate
    * pushdown, and column pruning, so every graft operator runs
    * unchanged over either; events get the same ts normalization. */
  def loadAs(spark: SparkSession, path: String, format: String,
             isEvents: Boolean = false): DataFrame = {
    val df = spark.read.format(format).load(path)
    if (isEvents) graft.streaming.EventStreams.normalizeTs(df) else df
  }

  /** Register every test table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

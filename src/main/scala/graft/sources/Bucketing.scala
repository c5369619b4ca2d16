package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle a fact table once so repeated
  * equi-joins and aggregations on the bucket key run with NO exchange.
  *
  * This is the 100 TB answer to the reference's "merge candidate
  * blocks then query" model for join-heavy workloads: instead of
  * paying a shuffle per query, pay one clustering write. Catalyst
  * recognizes matching bucket specs on both sides and plans
  * SortMergeJoin without Exchange.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (idempotent: drops
    * the table and clears a stale location from a previous session —
    * the catalog is per-JVM but the warehouse directory persists).
    *
    * `columns`, when non-empty, projects the table down to `key` ++
    * `columns` before the clustering write. The write's cost is one
    * shuffle plus a per-bucket sort of the FULL row payload — for a
    * workload family that only ever joins/aggregates a known column
    * subset, carrying the rest through the sort is pure spill budget
    * (at sf100 on this box it is the difference between fitting in
    * disk headroom and not). Leave empty for a general-purpose layout.
    *
    * `buckets` sizes the per-task sort: each write task sorts exactly
    * rows/buckets rows, so at a fixed executor memory the bucket count
    * — not the data size — decides whether the sort spills. Scale it
    * with the table (e.g. sf100 lineitem at 128 buckets ≈ 4.7M rows
    * per sort). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      columns: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/" + table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val projected =
      if (columns.isEmpty) df
      else df.select((key +: columns.filterNot(_ == key)).map(df.col): _*)
    // Pre-partition on the bucket key with the SAME partition count:
    // bucket id and repartition hash are both pmod(murmur3(key), n), so
    // each write task holds exactly one bucket -> ONE file per bucket.
    // With multiple files per bucket Spark distrusts the written order
    // and re-inserts a per-partition sort under every downstream
    // SortMergeJoin — the exchange disappears but the sort (the
    // expensive half at scale) stays.
    projected.repartition(buckets, df.col(key))
      .write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet") // managed table under spark.sql.warehouse.dir
      .saveAsTable(table)
  }

  /** Re-register an ALREADY-WRITTEN bucketed table in a fresh session.
    * The default in-memory catalog forgets bucket metadata when the
    * JVM exits, but the bucket files (with their `_000NN` suffixes)
    * persist — a CREATE TABLE ... CLUSTERED BY over the existing
    * location restores the bucketed-scan plan without re-paying the
    * clustering write. Schema is inferred from the parquet files.
    * Returns false when the location has no files (nothing to reuse). */
  def registerExisting(spark: SparkSession, table: String, key: String,
      buckets: Int): Boolean = {
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/" + table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(loc) || !fs.exists(new org.apache.hadoop.fs.Path(loc, "_SUCCESS")))
      return false
    val schema = spark.read.parquet(loc.toString).schema
    val cols = schema.fields
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(
      s"""CREATE TABLE $table ($cols) USING PARQUET
         |CLUSTERED BY (`$key`) SORTED BY (`$key`) INTO $buckets BUCKETS
         |LOCATION '${loc.toUri}'""".stripMargin)
    true
  }

  /** Join two bucketed tables on their shared bucket key. When bucket
    * specs match, the physical plan contains no Exchange on either
    * side (verify with .explain / PlanAuditSpec). */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}

package graft.sources

import org.apache.spark.sql.DataFrame

/** Re-layout a table into "micro-blocks" — small parquet files, one row
  * group each, range-clustered on a zone column.
  *
  * The reference does this with a driver-side rewrite to a small
  * row-group-size parquet (reference: parquet_to_microblocks.py:1-22,
  * 16384-row groups). Spark-natively the unit of parallel I/O is the
  * file split, so graft's micro-block = one small parquet file, and the
  * rewrite is a distributed range-repartition: `repartitionByRange` on
  * the cluster key gives each block a tight, non-overlapping min/max on
  * that key — which is what makes zone-map pruning effective (a random
  * layout gives every block the full value range and prunes nothing).
  * At 100 TB this is a standard one-off clustering pass (sort-based
  * shuffle, no driver involvement).
  */
object MicroBlockWriter {

  /** Write `df` as `numBlocks` range-clustered micro-block files. */
  def write(df: DataFrame, outPath: String, clusterBy: String, numBlocks: Int): Unit =
    df.repartitionByRange(numBlocks, df.col(clusterBy))
      .sortWithinPartitions(clusterBy)
      .write
      .mode("overwrite")
      // one row group per file: block size larger than any block's data
      .option("parquet.block.size", (256L * 1024 * 1024).toString)
      .parquet(outPath)

  /** Hive-style partitioned layout: directory per `partitionCol` value,
    * micro-blocks range-clustered on `clusterBy` inside each partition.
    * The coarse layer prunes at the *directory listing* (Catalyst
    * PartitionFilters — zero file I/O for skipped partitions); the
    * zone maps then prune files inside surviving partitions. This
    * two-level layout (e.g. date partitions × key-clustered files) is
    * the standard 100 TB fact-table arrangement. */
  def writePartitioned(df: DataFrame, outPath: String, partitionCol: String,
      clusterBy: String, blocksPerPartition: Int): Unit =
    df.repartition(df.col(partitionCol),
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(df.col(clusterBy)),
          org.apache.spark.sql.functions.lit(blocksPerPartition)))
      .sortWithinPartitions(partitionCol, clusterBy)
      .write
      .mode("overwrite")
      .partitionBy(partitionCol)
      .option("parquet.block.size", (256L * 1024 * 1024).toString)
      .parquet(outPath)
}

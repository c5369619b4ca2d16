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
}

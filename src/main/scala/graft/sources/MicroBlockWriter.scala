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

  /** Result of [[compact]]: how many undersized blocks were rewritten
    * into how many merged blocks, and the rows that moved. */
  final case class CompactStats(smallFiles: Int, mergedFiles: Int, rowsMoved: Long)

  /** Compact the SMALL-FILE TAIL of a micro-block table — the classic
    * operational need of any file-skipping layout at 100 TB: streaming
    * appends and partial rewrites accumulate undersized blocks, each
    * costing a footer read, an index row, and a task, while zone-map
    * effectiveness decays as ranges fragment. Files with fewer than
    * `minRows` rows are re-clustered (repartitionByRange on the zone
    * column — a distributed sort-shuffle over ONLY the small tail,
    * never the whole table) into ceil(rows/targetRows) replacement
    * blocks written alongside the survivors; originals are deleted
    * after the rewrite lands. Block-count decisions are metadata-scale
    * (per-file row counts from footers); row data never touches the
    * driver.
    *
    * Contract: rebuild (or refresh after filtering removed files) the
    * stats index afterward — compaction reassigns rows to new blocks,
    * so per-block row offsets are re-derived. [[graft.engine
    * .GraftEngine]] builds its index at construction, so a fresh
    * engine over the compacted path sees consistent state. */
  def compact(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      clusterBy: String, minRows: Long, targetRows: Long): CompactStats = {
    import org.apache.spark.sql.functions._
    val stats = MicroBlockIndex.build(spark, tablePath, "compact_probe")
    val perFile = stats.filter(col("column") === clusterBy)
      .groupBy("file").agg(sum("rows").as("rows"))
      .collect().map(r => (r.getString(0), r.getLong(1))) // file-listing scale
    val small = perFile.filter(_._2 < minRows)
    if (small.length < 2) return CompactStats(small.length, 0, 0L)
    val rowsMoved = small.map(_._2).sum
    val nGroups = math.max(1, math.ceil(rowsMoved.toDouble / targetRows).toInt)
    val tmp = s"$tablePath/_compact_tmp"
    spark.read.parquet(small.map(_._1): _*)
      .repartitionByRange(nGroups, col(clusterBy))
      .sortWithinPartitions(clusterBy)
      .write.mode("overwrite")
      .option("parquet.block.size", (256L * 1024 * 1024).toString)
      .parquet(tmp)
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = new org.apache.hadoop.fs.Path(tablePath).getFileSystem(conf)
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(tmp)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    parts.zipWithIndex.foreach { case (s, i) =>
      fs.rename(s.getPath,
        new org.apache.hadoop.fs.Path(tablePath, f"compact-$stamp-$i%05d.parquet"))
    }
    small.foreach { case (f, _) =>
      fs.delete(new org.apache.hadoop.fs.Path(f), false)
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    CompactStats(small.length, parts.size, rowsMoved)
  }

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

  /** Z-ORDERED micro-block layout: range-cluster on the Morton
    * interleave of quantile-bucket ids over `zCols` (Delta/Iceberg
    * OPTIMIZE ZORDER BY semantics). Single-key clustering gives zone
    * maps selectivity on ONE column; the z-value keeps rows close in
    * every z dimension, so each block gets a tight min/max box on ALL
    * of them and multi-column predicates prune files on every
    * dimension at once.
    *
    * Two passes, both fully distributed: (1) one aggregation computes
    * 2^bits−1 approximate quantile boundaries per column (skew-proof
    * bucketing — linear min/max scaling would collapse under a hot
    * value); (2) bucket ids are computed SCAN-LOCALLY against the
    * literal boundary arrays, interleaved by the codegen'd [[graft
    * .functions.ZValue]], and range-repartitioned. The sort key is
    * dropped before writing — the layout, not the schema, carries it. */
  def writeZOrdered(df: DataFrame, outPath: String, zCols: Seq[String],
      numBlocks: Int, bits: Int = 6): Unit = {
    import org.apache.spark.sql.functions._
    require(zCols.nonEmpty && zCols.size * bits <= 63,
      s"zorder: ${zCols.size} dims x $bits bits must fit in 63")
    val nB = 1 << bits
    val cuts = (1 until nB).map(_.toDouble / nB).toArray
    val boundsRow = df.select(zCols.map(c =>
      percentile_approx(df.col(c).cast("double"), typedlit(cuts), lit(10000)).as(c)): _*)
      .head()
    val buckets = zCols.zipWithIndex.map { case (c, i) =>
      graft.functions.ZOrder.bucket(df.col(c).cast("double"),
        boundsRow.getSeq[Double](i))
    }
    df.withColumn("_graft_z", graft.functions.ZOrder.zvalue(buckets, bits))
      .repartitionByRange(numBlocks, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
      .write
      .mode("overwrite")
      .option("parquet.block.size", (256L * 1024 * 1024).toString)
      .parquet(outPath)
  }
}

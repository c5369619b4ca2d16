package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.{BlockStat, MicroBlockIndex}

/** Streaming ingestion INTO the micro-block layout — the missing end of
  * the engine's lifecycle: events arrive as a stream, land as
  * range-clustered micro-block files, and the zone-map index keeps up
  * INCREMENTALLY (only new footers are read, ids/row-offsets extend the
  * existing index — [[MicroBlockIndex.refresh]]).
  *
  * Per micro-batch: range-cluster the batch on the zone column (a
  * batch-local sort-shuffle — each appended file gets a tight min/max,
  * so pruning works on freshly-landed data immediately), append the
  * files, refresh the index. At 100 TB/day this is the standard
  * streaming-lakehouse write path (cluster-on-write + incremental
  * stats); the small-file tail the batches accumulate is exactly what
  * [[graft.sources.MicroBlockWriter.compact]] exists to fold in.
  */
final class StreamIngest(
    spark: SparkSession,
    outPath: String,
    table: String,
    clusterBy: String,
    blocksPerBatch: Int) {

  @volatile private var idx: Option[Dataset[BlockStat]] = None

  /** The current zone-map index over everything ingested so far. */
  def index: Dataset[BlockStat] = synchronized {
    idx.getOrElse(MicroBlockIndex.build(spark, outPath, table))
  }

  private def ingestBatch(batch: DataFrame): Unit = {
    batch
      .repartitionByRange(blocksPerBatch, batch.col(clusterBy))
      .sortWithinPartitions(clusterBy)
      .write.mode("append")
      .option("parquet.block.size", (256L * 1024 * 1024).toString)
      .parquet(outPath)
    synchronized {
      idx = Some(idx match {
        case None => MicroBlockIndex.build(spark, outPath, table)
        case Some(existing) =>
          MicroBlockIndex.refresh(spark, outPath, table, existing)
      })
    }
  }

  /** Attach to a streaming DataFrame and start the ingest query. */
  def start(stream: DataFrame, queryName: String): StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .foreachBatch((batch: DataFrame, _: Long) => ingestBatch(batch))
      .start()
}

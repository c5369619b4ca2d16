package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.{GraftSession, Tables}
import graft.plans.{Between, IndexPruning, PredValue}
import graft.sources.{MicroBlockIndex, MicroBlockWriter}
import graft.streaming.{EventStreams, StreamIngest}

/** The lakehouse MAINTENANCE LOOP as one composed cycle — the
  * operational write path a streaming micro-block table lives by:
  *
  *   stream-ingest (small clustered blocks, index kept fresh
  *   incrementally) → small-file tail compaction → index refresh →
  *   pruned query — then the NEXT ingest wave over the compacted
  *   table, and the loop again.
  *
  * StreamIngestSpec proves ingest; the compact audit proves
  * compaction; this spec proves the COMPOSITION: query results are
  * identical at every stage boundary, file counts strictly drop across
  * each compaction, and pruning stays exact over every generation of
  * the layout (fresh batches, compacted survivors, and their mix).
  */
class MaintenanceLoopSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-loop-test")
  private val dir = "/root/testdata/sf0.001"

  private val tsLo = "2024-01-05 00:00:00"
  private val tsHi = "2024-01-15 00:00:00"

  private def liveFiles(out: String): Set[String] =
    new java.io.File(out).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getName).toSet

  private def matching(d: DataFrame): Long = d.filter(
    col("ts") >= lit(tsLo).cast("timestamp") &&
      col("ts") <= lit(tsHi).cast("timestamp")).count()

  /** Pruned read: only the files the zone-map index keeps. */
  private def prunedCount(idx: DataFrame, out: String): Long = {
    val pred = Between("ts", PredValue.ts(tsLo), PredValue.ts(tsHi))
    val kept = IndexPruning.keptFiles(idx, pred)
    val skipped = IndexPruning.skippedFiles(idx, pred)
    // pruning must stay conservative at every stage: skipped files
    // hold zero matching rows
    if (skipped.nonEmpty) assert(matching(spark.read.parquet(skipped: _*)) == 0)
    if (kept.isEmpty) 0L else matching(spark.read.parquet(kept: _*))
  }

  test("ingest → compact → refresh → pruned query composes over two loop cycles") {
    val root = "target/scratch/test/loop"
    val src = s"$root/src"; val out = s"$root/table"
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(rm)); x.delete()
    }
    rm(new java.io.File(root))
    Seq(src, out).foreach(new java.io.File(_).mkdirs())

    val ev = Tables.load(spark, dir, "events")
      .filter(col("event_id") < 600).cache()
    val n = ev.count()
    val truth = matching(ev)
    assert(truth > 0, "fixture must have rows inside the ts window")

    // ── cycle 1: stream-ingest four small source files as four
    // micro-batches, two blocks each → a small-file tail of 8 blocks
    val quarters = (0 until 4).map(i => ev.filter(col("event_id") % 4 === i))
    quarters.zipWithIndex.foreach { case (q, i) =>
      q.coalesce(1).write.mode("overwrite").parquet(s"$src/stage")
      val part = new java.io.File(s"$src/stage").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(s"$src/events-$i.parquet").toPath)
      rm(new java.io.File(s"$src/stage"))
    }
    val ingest = new StreamIngest(spark, out, "events_loop", "ts", 2)
    val stream = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(s"$src/events-0.parquet").schema
      EventStreams.normalizeTs(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet").parquet(src))
    }
    val q = ingest.start(stream, "loop_ingest")
    try q.processAllAvailable() finally q.stop()

    val f0 = liveFiles(out)
    assert(f0.size >= 6, s"expected a small-file tail, got ${f0.size}")
    assert(spark.read.parquet(out).count() == n)
    // the incrementally-refreshed ingest index serves the query
    // correctly BEFORE any maintenance
    assert(prunedCount(ingest.index.toDF, out) == truth)

    // ── compact the tail; strictly fewer files, same bytes of truth
    val stats1 = MicroBlockWriter.compact(spark, out, "ts",
      minRows = 400, targetRows = 700)
    val f1 = liveFiles(out)
    assert(stats1.smallFiles >= 2 && f1.size < f0.size,
      s"compaction must strictly shrink the layout: ${f0.size} -> ${f1.size}")
    // compaction rewrites history → rebuild the index (the documented
    // contract) and the pruned query answer is unchanged
    val idx1 = MicroBlockIndex.build(spark, out, "events_loop").toDF.cache()
    assert(idx1.select("file").distinct.count() == f1.size)
    assert(spark.read.parquet(out).count() == n)
    assert(prunedCount(idx1, out) == truth)

    // ── cycle 2: the next ingest wave lands on the COMPACTED table
    // (continued stream = later batch ids), incremental refresh picks
    // up only the new files
    val more = Tables.load(spark, dir, "events")
      .filter(col("event_id") >= 600).cache()
    val m = more.count()
    val truthAll = truth + matching(more)
    val ingest2 = new StreamIngest(spark, out, "events_loop", "ts", 2)
    ingest2.ingestBatch(more.toDF, 100L)
    val f2 = liveFiles(out)
    assert(f2.size > f1.size && f1.subsetOf(f2),
      "wave 2 must append beside the compacted survivors")
    assert(spark.read.parquet(out).count() == n + m)
    assert(prunedCount(ingest2.index.toDF, out) == truthAll)

    // ── compact again: folds ONLY the new tail (survivors of pass 1
    // are above the threshold), strictly fewer files again
    val stats2 = MicroBlockWriter.compact(spark, out, "ts",
      minRows = 400, targetRows = 700)
    val f3 = liveFiles(out)
    assert(stats2.smallFiles >= 2 && f3.size < f2.size,
      s"second compaction must shrink again: ${f2.size} -> ${f3.size}")
    assert(f1.subsetOf(f3), "pass-1 survivors must not be rewritten twice")
    val idx2 = MicroBlockIndex.build(spark, out, "events_loop").toDF.cache()
    assert(spark.read.parquet(out).count() == n + m)
    assert(prunedCount(idx2, out) == truthAll)
  }
}

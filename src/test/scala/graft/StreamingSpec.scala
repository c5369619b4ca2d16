package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{GraftSession, Tables}
import graft.streaming.EventStreams

/** The streaming plans must produce, when run incrementally under
  * Structured Streaming, the same results as their batch twins (which
  * are oracle-verified against DuckDB).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-stream-test")
  private val dir = "/root/testdata/sf0.001"

  /** FileStreamSource requires a directory; stage the single-file table
    * into scratch (this is also how an events stream lands in practice:
    * a directory of arriving part files). */
  private lazy val streamDir: String = {
    val d = java.nio.file.Paths.get("target/scratch/stream/events")
    java.nio.file.Files.createDirectories(d)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    d.toString
  }

  test("hourly agg: streaming result == batch result") {
    val batch = EventStreams.hourlyAgg(Tables.load(spark, dir, "events"))
      .orderBy("hour_start", "event_type").collect()

    val stream = EventStreams.readStream(spark, streamDir)
    val q = EventStreams.hourlyAggStream(stream)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .orderBy("hour_start", "event_type").collect()
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("watermarked append-mode windows emit only closed windows") {
    val stream = EventStreams.readStream(spark, streamDir)
    val q = EventStreams.hourlyAggStream(stream)
      .writeStream.format("memory").queryName("hourly_append")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val n = spark.table("hourly_append").count()
      // append mode withholds windows not yet past the watermark — the
      // final (max-ts) windows stay open, so strictly fewer rows than
      // complete mode's total distinct windows.
      val total = EventStreams.hourlyAgg(Tables.load(spark, dir, "events")).count()
      assert(n < total && n >= 0)
    } finally q.stop()
  }
}

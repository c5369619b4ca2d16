package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{GraftSession, Tables}
import graft.plans.{Between, IndexPruning, PredValue}
import graft.streaming.{EventStreams, StreamIngest}

/** Streaming ingestion into the micro-block layout: rows survive
  * exactly, the index refreshes incrementally per micro-batch, and
  * pruning is immediately correct over freshly-landed files.
  */
class StreamIngestSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-ingest-test")
  private val dir = "/root/testdata/sf0.001"

  private def freshDirs(tag: String): (String, String) = {
    val src = s"target/scratch/test/ingest/$tag/src"
    val out = s"target/scratch/test/ingest/$tag/table"
    val fs = new java.io.File(src); fs.mkdirs()
    Seq(src, out).foreach { d =>
      val f = new java.io.File(d)
      if (f.exists()) { // clean slate per run
        def rm(x: java.io.File): Unit = {
          Option(x.listFiles()).foreach(_.foreach(rm)); x.delete()
        }
        rm(f)
      }
      f.mkdirs()
    }
    (src, out)
  }

  test("ingest lands all rows, refreshes the index per batch, prunes correctly") {
    val (src, out) = freshDirs("basic")
    // split events into two source files => two micro-batches
    // (maxFilesPerTrigger=1)
    val ev = Tables.load(spark, dir, "events")
    val n = ev.count()
    val half = ev.filter(col("event_id") % 2 === 0)
    val rest = ev.filter(col("event_id") % 2 =!= 0)
    half.coalesce(1).write.mode("overwrite").parquet(s"$src/a")
    rest.coalesce(1).write.mode("overwrite").parquet(s"$src/b")
    // stage as flat files for the file stream source
    val fs = new java.io.File(src)
    Seq("a", "b").zipWithIndex.foreach { case (sub, i) =>
      val part = new java.io.File(s"$src/$sub").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(s"$src/events-$i.parquet").toPath)
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete()
      }
      rm(new java.io.File(s"$src/$sub"))
    }

    val ingest = new StreamIngest(spark, out, "events_ingest", "ts", 2)
    val stream = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(src).schema
      EventStreams.normalizeTs(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(src))
    }
    val q = ingest.start(stream, "ingest_test")
    try q.processAllAvailable() finally q.stop()

    // every row landed
    assert(spark.read.parquet(out).count() == n)

    val idx = ingest.index.toDF.cache()
    // the index covers exactly the landed files
    val landed = new java.io.File(out).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(idx.select("file").distinct.count() == landed && landed >= 3,
      s"expected >=3 files (2 batches x up to 2 blocks), got $landed")
    // block ids unique, row ranges contiguous from 0 to n-1
    val metas = idx.select("blockId", "rowStart", "rowEnd").distinct
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(metas.map(_._1).distinct.length == metas.length)
    assert(metas.head._2 == 0L)
    assert(metas.last._3 == n - 1)
    metas.sliding(2).foreach {
      case Array((_, _, e1), (_, s2, _)) => assert(s2 == e1 + 1)
      case _ =>
    }

    // pruning over freshly ingested data: skipped files provably hold
    // zero matching rows and kept files serve the full answer
    val tsLo = "2024-03-01 00:00:00"
    val tsHi = "2024-03-08 00:00:00"
    val pred = Between("ts", PredValue.ts(tsLo), PredValue.ts(tsHi))
    val skipped = IndexPruning.skippedFiles(idx, pred)
    val matches = (d: org.apache.spark.sql.DataFrame) => d.filter(
      col("ts") >= lit(tsLo).cast("timestamp") &&
        col("ts") <= lit(tsHi).cast("timestamp")).count()
    if (skipped.nonEmpty)
      assert(matches(spark.read.parquet(skipped: _*)) == 0)
    val kept = IndexPruning.keptFiles(idx, pred)
    assert(matches(spark.read.parquet(kept: _*)) == matches(spark.read.parquet(out)))
  }

  test("maintained views stay fresh across ingest batches with no manual refresh") {
    // round-13 verdict ask #8: StreamIngest's commit path folds each
    // batch's delta into attached AggViews (the O(delta + merged)
    // append path), so the TRANSPARENT matview serve keeps firing on
    // plain SQL as batches land — no manual AggView.refresh.
    val (_, out) = freshDirs("views")
    val ev = Tables.load(spark, dir, "events")
    val view = "target/scratch/test/ingest/views/view"
    val ingest = new StreamIngest(spark, out, "events_mv", "ts", 2,
      maintainViews = Seq(view))

    // batch 0 lands BEFORE the view exists: the deferred-refresh path
    ingest.ingestBatch(ev.filter(col("event_id") % 3 === 0), 0)
    graft.sources.AggView.build(spark, out, view,
      Seq("event_type"), "user_id")
    graft.plans.AggViewRewriteRule.registerView(out, view)
    val q = "SELECT event_type, COUNT(DISTINCT user_id) AS nd " +
      "FROM ingest_mv_t GROUP BY event_type"
    def served() = {
      spark.read.parquet(out).createOrReplaceTempView("ingest_mv_t")
      spark.sql(q)
    }
    def scansView(df: org.apache.spark.sql.DataFrame): Boolean = {
      val needle = new java.io.File(view).getAbsolutePath
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.exists(_.toString.contains(needle))
      }.exists(identity)
    }
    assert(scansView(served()), "fresh view must serve")

    // two more batches: each commit folds its delta into the view, so
    // the serve keeps firing and the counts track the live table
    ingest.ingestBatch(ev.filter(col("event_id") % 3 === 1), 1)
    val afterB1 = served()
    assert(scansView(afterB1),
      "the maintained view must stay fresh after batch 1 - no manual refresh")
    ingest.ingestBatch(ev.filter(col("event_id") % 3 === 2), 2)
    val afterB2 = served()
    assert(scansView(afterB2),
      "the maintained view must stay fresh after batch 2")
    val truth = spark.read.parquet(out).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("nd"))
      .collect().map(_.toString).sorted.toSeq
    assert(afterB2.collect().map(_.toString).sorted.toSeq == truth)
    assert(spark.read.parquet(out).count() == ev.count(),
      "all three batches must have landed")
  }

  test("sidecars ride the batch commit: transparent serves answer fresh right after ingest") {
    import spark.implicits._
    val (_, out) = freshDirs("sidecar-fresh")
    val ingest = new StreamIngest(spark, out, "events_sc", "ts", 2)
    val ev = Tables.load(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type")
    // batch 0 lands, then sidecars are built over it (the pre-stream
    // state every indexed table starts from)
    ingest.ingestBatch(ev.filter(col("event_id") % 2 === 0), 0)
    graft.sources.MicroBlockIndex.saveSidecar(
      graft.sources.MicroBlockIndex.build(spark, out, "events_sc"), out)
    graft.sources.DictionaryIndex.saveSidecar(
      graft.sources.DictionaryIndex.build(spark, out, "events_sc",
        Seq("event_type")), out)
    def count(): Long = {
      val df = spark.sql(s"SELECT COUNT(*) AS n FROM parquet.`$out`")
      require(graft.plans.ZoneAggRule.servedSignature(
        df.queryExecution.optimizedPlan), "zone serve must fire")
      df.collect().head.getLong(0)
    }
    val n0 = count()
    assert(n0 == ev.filter(col("event_id") % 2 === 0).count())
    // batch 1 commits — the sidecars must fold the new files IN THE
    // SAME commit, so the very next query serves fresh (pre-round-14:
    // the file-set gate refused every serve until a manual refresh)
    ingest.ingestBatch(ev.filter(col("event_id") % 2 =!= 0), 1)
    val n1 = count()
    assert(n1 == ev.count(), s"post-commit serve must see batch 1: $n1")
    // the dict sidecar refreshed too: its file set matches the listing
    val dict = graft.sources.DictionaryIndex.load(spark,
      graft.sources.DictionaryIndex.sidecarPath(out))
    val dictFiles = dict.select("file").distinct()
      .collect().map(r => graft.plans.ZoneMapPruneRule.normFile(r.getString(0))).toSet
    val live = graft.sources.MicroBlockIndex.listParquetFiles(out)
      .map(graft.plans.ZoneMapPruneRule.normFile).toSet
    assert(dictFiles == live, "dict sidecar must cover the live listing")
  }

  test("per-file sums ride the commit: SUM serves immediately after ingest") {
    import spark.implicits._
    val (_, out) = freshDirs("sums-fresh")
    val ingest = new StreamIngest(spark, out, "events_sum", "ts", 2)
    val ev = Tables.load(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type")
    ingest.ingestBatch(ev.filter(col("event_id") % 2 === 0), 0)
    // a SUMS-BEARING sidecar over the pre-stream state (withSums is
    // the explicit opt-in; the stream must keep it serving)
    val idx = graft.sources.MicroBlockIndex.build(spark, out, "events_sum")
    graft.sources.MicroBlockIndex.saveSidecar(
      graft.sources.MicroBlockIndex.withSums(spark, out, idx,
        Seq("user_id")), out)
    def sumServe(): Long = {
      val df = spark.sql(s"SELECT SUM(user_id) AS s FROM parquet.`$out`")
      require(graft.plans.ZoneAggRule.servedSignature(
        df.queryExecution.optimizedPlan),
        "the SUM serve must fire — a sums-less refresh would refuse")
      df.collect().head.getLong(0)
    }
    val half = ev.filter(col("event_id") % 2 === 0)
      .agg(sum(col("user_id"))).first.getLong(0)
    assert(sumServe() == half)
    // the commit's refresh must stamp the NEW files' per-file sums
    // (round 15) — before, the sidecar went sums-stale per batch and
    // every SUM refused until a manual 15-second withSums rebuild
    ingest.ingestBatch(ev.filter(col("event_id") % 2 =!= 0), 1)
    val full = ev.agg(sum(col("user_id"))).first.getLong(0)
    assert(sumServe() == full,
      "post-commit SUM must serve fresh, including the new files' sums")
  }

  test("batch replay and crash remnants land exactly once (idempotent ingest)") {
    val (_, out) = freshDirs("idem")
    val ev = Tables.load(spark, dir, "events").limit(500).cache()
    val n = ev.count()
    val ingest = new StreamIngest(spark, out, "events_idem", "ts", 2)

    // simulate a CRASHED first attempt: data files landed under the
    // batch-0 prefix but no commit marker was written
    val scratch = "target/scratch/test/ingest/idem/remnant"
    ev.limit(100).coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    new java.io.File(out).mkdirs()
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(s"$out/b0-part-remnant.parquet").toPath)

    // the redo of batch 0 must sweep the remnant, never double rows
    ingest.ingestBatch(ev.toDF, 0L)
    assert(spark.read.parquet(out).count() == n)
    // at-least-once replay of a COMMITTED batch is a no-op
    ingest.ingestBatch(ev.toDF, 0L)
    assert(spark.read.parquet(out).count() == n)
    // the next batch still appends normally
    val more = Tables.load(spark, dir, "events").limit(800).exceptAll(ev)
    val m = more.count()
    ingest.ingestBatch(more.toDF, 1L)
    assert(spark.read.parquet(out).count() == n + m)
    // the index covers exactly the committed files — no remnant, no
    // staging leftovers, no double-indexed replay
    val landed = new java.io.File(out).listFiles()
      .count(f => f.getName.endsWith(".parquet") && f.getName.startsWith("b"))
    val idx = ingest.index.toDF
    assert(idx.select("file").distinct.count() == landed)
    assert(!new java.io.File(out).listFiles().exists(_.getName.startsWith("_staging")))
  }

  test("two streams sharing one directory don't collide on batch ids (streamId namespacing)") {
    val (_, out) = freshDirs("multi")
    val ev = Tables.load(spark, dir, "events").limit(600).cache()
    val a = ev.limit(200).cache(); val na = a.count()
    val b = ev.limit(500).exceptAll(a).cache(); val nb = b.count()
    val ingA = new StreamIngest(spark, out, "events_multi", "ts", 2, streamId = "A")
    val ingB = new StreamIngest(spark, out, "events_multi", "ts", 2, streamId = "B")
    // both streams land THEIR OWN batch 0: without namespacing, B's
    // batch 0 would see A's commit marker and silently skip (or sweep
    // A's files as "remnants of a failed attempt")
    ingA.ingestBatch(a.toDF, 0L)
    ingB.ingestBatch(b.toDF, 0L)
    assert(spark.read.parquet(out).count() == na + nb)
    // replays stay idempotent PER stream
    ingA.ingestBatch(a.toDF, 0L)
    ingB.ingestBatch(b.toDF, 0L)
    assert(spark.read.parquet(out).count() == na + nb)
    val files = new java.io.File(out).listFiles().map(_.getName)
    assert(files.exists(_.startsWith("sA-b0-")) && files.exists(_.startsWith("sB-b0-")))
  }

  test("readStream on an empty ingest directory starts with the default events schema") {
    val empty = "target/scratch/test/ingest/empty-src"
    val f = new java.io.File(empty); f.mkdirs()
    Option(f.listFiles()).foreach(_.foreach(_.delete()))
    // a normal start state for file-stream ingestion: the directory
    // exists but no files have landed yet — defining the stream must
    // not throw on schema inference
    val df = EventStreams.readStream(spark, empty)
    assert(df.isStreaming)
    assert(df.schema.fieldNames.toSet ==
      Set("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("index refresh is incremental: existing block ids and offsets are stable") {
    val (src, out) = freshDirs("incr")
    val ev = Tables.load(spark, dir, "events").limit(1000).cache()
    ev.coalesce(1).write.mode("overwrite").parquet(s"$src/stage")
    val part = new java.io.File(s"$src/stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get

    val ingest = new StreamIngest(spark, out, "events_incr", "ts", 2)
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(s"$src/f0.parquet").toPath)
    def mkStream = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(s"$src/f0.parquet").schema
      EventStreams.normalizeTs(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet")
          .parquet(src))
    }
    val q = ingest.start(mkStream, "ingest_incr")
    try {
      q.processAllAvailable()
      val before = ingest.index.toDF
        .select("blockId", "file", "rowStart", "rowEnd").distinct
        .collect().map(_.toString).toSet

      // second wave of data arrives while the query is live
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(s"$src/f1.parquet").toPath)
      q.processAllAvailable()
      val after = ingest.index.toDF
        .select("blockId", "file", "rowStart", "rowEnd").distinct
        .collect().map(_.toString).toSet

      // strictly grew, and every pre-existing (id, file, range) survived
      assert(before.subsetOf(after) && after.size > before.size)
      assert(spark.read.parquet(out).count() == 2000)
    } finally q.stop()
  }
}

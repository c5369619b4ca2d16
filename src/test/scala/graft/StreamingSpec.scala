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

  test("top-k leaderboard: streaming (complete mode) == batch result") {
    val batch = EventStreams.topUsers(Tables.load(spark, dir, "events"), 5)
      .collect().map(_.toString).toSeq

    val q = EventStreams.topUsers(EventStreams.readStream(spark, streamDir), 5)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("topk_out").collect().map(_.toString).toSeq
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
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

  test("stream-stream interval join == batch twin (watermarked, bounded state)") {
    val ev = Tables.load(spark, dir, "events")
    val batch = EventStreams.attributionJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"))
      .orderBy("purchase_id", "click_id").collect()

    val clicks = EventStreams.readStream(spark, streamDir)
      .filter(col("event_type") === "click")
    val purchases = EventStreams.readStream(spark, streamDir)
      .filter(col("event_type") === "purchase")
    val q = EventStreams.attributionJoinStream(clicks, purchases)
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("attr_out")
        .orderBy("purchase_id", "click_id").collect()
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup (watermarked, bounded state) covers the batch key set") {
    val batchKeys = EventStreams.dedupFirst(Tables.load(spark, dir, "events"))
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

    val q = EventStreams.dedupStream(EventStreams.readStream(spark, streamDir))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("dedup_out")
        .select("user_id", "event_type").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      // streaming emits exactly one survivor per key (arrival-order
      // representative); the KEY SET must match the batch twin's
      assert(streamed.length == streamed.toSet.size, "emitted a duplicate key")
      assert(streamed.toSet == batchKeys)
      assert(batchKeys.nonEmpty)
    } finally q.stop()
  }

  test("sliding-window agg: streaming result == batch result") {
    val batch = EventStreams.slidingAgg(Tables.load(spark, dir, "events"))
      .orderBy("window_start", "event_type").collect()

    val q = EventStreams.slidingAggStream(EventStreams.readStream(spark, streamDir))
      .writeStream.format("memory").queryName("sliding_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sliding_out")
        .orderBy("window_start", "event_type").collect()
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream-static enrichment join: streaming summary == batch twin") {
    val batch = EventStreams.segmentAgg(EventStreams.enrich(
        Tables.load(spark, dir, "events"), Tables.load(spark, dir, "customer")))
      .orderBy("segment", "event_type").collect()

    val q = EventStreams.segmentAgg(EventStreams.enrich(
        EventStreams.readStream(spark, streamDir),
        Tables.load(spark, dir, "customer")))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("enrich_out")
        .orderBy("segment", "event_type").collect()
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization == oracle-checked batch twin") {
    import spark.implicits._
    import graft.streaming.StatefulSessions
    import graft.streaming.StatefulSessions.Ev

    // streaming run over the staged events dir (single micro-batch)
    val evStream = EventStreams.readStream(spark, streamDir)
      .selectExpr("user_id", "unix_micros(ts) AS tsMicros").as[Ev]
    val q = StatefulSessions.sessionize(evStream)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("update").start()
    val streamed = try {
      q.processAllAvailable()
      spark.table("sessions_out")
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("sessions").as("sessions"),
          org.apache.spark.sql.functions.max("events").as("events"))
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    } finally q.stop()

    // batch twin: the lag-based st_sessionize (DuckDB-oracle-verified)
    val batch = SparkEntry.queries("st_sessionize")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2).toInt, r.getLong(1)))).toMap

    assert(streamed == batch,
      s"stateful streaming diverges from batch: ${streamed.toSeq.sorted.take(3)} vs ${batch.toSeq.sorted.take(3)}")
  }

  test("CDC latest-state: streaming snapshot == oracle-checked batch twin") {
    import graft.streaming.CdcState
    // single micro-batch over the staged dir: every key emits exactly
    // once, so the memory table IS the snapshot
    val q = CdcState.latestStream(
        CdcState.changesOf(EventStreams.readStream(spark, streamDir)))
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode("update").start()
    val streamed = try {
      q.processAllAvailable()
      spark.table("cdc_out").collect().map(_.toString).sorted.toSeq
    } finally q.stop()
    val batch = CdcState.latestState(Tables.load(spark, dir, "events"))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("CDC latest-state: late changes never regress state across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.CdcState
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s:00")
    val ms = MemoryStream[(Long, Long, String, Double, java.sql.Timestamp)]
    val q = CdcState.latestStream(CdcState.changesOf(
        ms.toDF.toDF("user_id", "event_id", "event_type", "value", "ts")))
      .writeStream.format("memory").queryName("cdc_mb_out")
      .outputMode("update").start()
    try {
      ms.addData((1L, 1L, "a", 1.0, t("10:00")), (2L, 2L, "b", 2.0, t("10:00")))
      q.processAllAvailable()
      assert(spark.table("cdc_mb_out").count() == 2)
      // user 1's change is LATE (older ts): state must NOT regress and
      // must NOT re-emit; user 2's is newer and must emit
      ms.addData((1L, 3L, "late", 9.0, t("09:00")), (2L, 4L, "c", 3.0, t("11:00")))
      q.processAllAvailable()
      assert(spark.table("cdc_mb_out").count() == 3)
      // equal ts, higher event_id: the deterministic tiebreak advances
      ms.addData((1L, 5L, "tie", 4.0, t("10:00")))
      q.processAllAvailable()
      val rows = spark.table("cdc_mb_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
      assert(rows == Set(
        (1L, 1L, "a", 1.0), (2L, 2L, "b", 2.0),
        (2L, 4L, "c", 3.0), (1L, 5L, "tie", 4.0)))
    } finally q.stop()
    // pure-fold checks: within-batch late + tie handling
    import graft.streaming.CdcState.{Change, Latest}
    val s1 = CdcState.advance(None, Seq(Change(1, 10, "x", 1.0, 100)))
    assert(s1.contains(Latest(100, 10, "x", 1.0)))
    assert(CdcState.advance(s1, Seq(Change(1, 11, "old", 2.0, 50))).isEmpty)
    assert(CdcState.advance(s1, Seq(Change(1, 11, "tie", 2.0, 100)))
      .contains(Latest(100, 11, "tie", 2.0)))
  }

  test("streaming near-dup dedup converges to the batch estimate-pair answer across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.MinHashDedup
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(docs.nonEmpty)
    // the corpus carries planted near-dups; the batch answer must be
    // non-trivial or this test proves nothing
    val batch = MinHashDedup.pairsBatch(
        Tables.load(spark, dir, "documents"), 64, 4, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty, "no planted near-dups at est >= 0.5 — fixture broke")

    // three micro-batches split doc_id % 3 — planted duplicate pairs
    // land both within one batch and ACROSS batches, so the state path
    // (store-accumulate) and the intra-batch fold both carry weight
    val ms = MemoryStream[(Long, String)]
    val q = MinHashDedup.pairsStream(
        MinHashDedup.bandRows(ms.toDF.toDF("doc_id", "text")), tau = 0.5)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      (0 until 3).foreach { i =>
        ms.addData(docs.filter(_._1 % 3 == i))
        q.processAllAvailable()
      }
      // distinct over band-collision multiplicity == the batch pair set
      val streamed = spark.table("neardup_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == batch,
        s"streamed ${streamed.size} pairs != batch ${batch.size}: " +
          s"missing ${batch -- streamed}, extra ${streamed -- batch}")
    } finally q.stop()

    // pure-fold checks: replay idempotence + intra-batch ordering
    import graft.streaming.MinHashDedup.{BandRow, BandState, DocSig}
    val sigA = Seq.fill(64)(7L)
    val sigB = Seq.tabulate(64)(i => if (i < 32) 7L else 9L) // est 0.5
    val (p1, st1) = MinHashDedup.advance(BandState(Nil),
      Seq(BandRow("k", 2L, sigB), BandRow("k", 1L, sigA)), tau = 0.5)
    assert(p1 == Seq(MinHashDedup.NearDupPair(1L, 2L, 0.5)),
      "intra-batch fold must pair in doc_id order")
    assert(st1.entries.map(_.doc_id).toSet == Set(1L, 2L))
    // re-delivery of doc 2 (at-least-once replay): no duplicate pair,
    // no duplicate state entry
    val (p2, st2) = MinHashDedup.advance(st1, Seq(BandRow("k", 2L, sigB)), 0.5)
    assert(p2.isEmpty && st2.entries.size == 2)
    // a genuinely new doc pairs against the accumulated store
    val (p3, _) = MinHashDedup.advance(st2, Seq(BandRow("k", 3L, sigA)), 0.5)
    assert(p3.map(p => (p.doc_a, p.doc_b)).toSet == Set((1L, 3L), (2L, 3L)))
  }

  test("near-dup retention horizon: in-horizon pairs kept, state bounded, default keep-everything unchanged") {
    import graft.streaming.MinHashDedup
    import graft.streaming.MinHashDedup.{BandRow, BandState, NearDupPair}
    val sig = Seq.fill(64)(7L) // identical signatures: everything pairs at est 1.0
    // Feed 50 docs 60 ms apart through one band with a 100 ms horizon:
    // at each fold only the PREVIOUS doc (60 ms old) is in horizon;
    // the one before it (120 ms) must have been dropped from state.
    val horizon = Some(100L)
    var st = BandState(Nil)
    var emitted = Vector.empty[NearDupPair]
    (0 until 50).foreach { i =>
      val (p, next) = MinHashDedup.advance(st,
        Seq(BandRow("k", i.toLong, sig, ts = i * 60L)), 0.5, horizon)
      emitted ++= p
      st = next
    }
    // (b) state bounded: without TTL this band would hold all 50 sigs
    assert(st.entries.size <= 2,
      s"retention did not bound state: ${st.entries.size} entries")
    // (a) pairs WITHIN the horizon still emitted, at every point in the feed
    assert((1 until 50).forall(i =>
      emitted.contains(NearDupPair(i - 1L, i.toLong, 1.0))),
      "an in-horizon pair was lost")
    // expired signatures never pair (gap >= 2 docs = 120 ms > horizon)
    assert(!emitted.exists(p => p.doc_b - p.doc_a >= 2),
      "an expired signature produced a pair")
    // (c) the keep-everything default on the same feed: full state,
    // full quadratic pair set — byte-identical to pre-TTL behavior
    var st0 = BandState(Nil)
    var n0 = 0
    (0 until 50).foreach { i =>
      val (p, next) = MinHashDedup.advance(st0,
        Seq(BandRow("k", i.toLong, sig, ts = i * 60L)), 0.5, None)
      n0 += p.size
      st0 = next
    }
    assert(st0.entries.size == 50 && n0 == 50 * 49 / 2,
      s"default path changed: ${st0.entries.size} entries, $n0 pairs")

    // end-to-end through the streaming operator: ts-carrying docs,
    // horizon 100 ms — the cross-batch store honors retention
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val ms = MemoryStream[(Long, String, Long)]
    val q = MinHashDedup.pairsStream(
        MinHashDedup.bandRows(ms.toDF.toDF("doc_id", "text", "ts"),
          tsCol = Some("ts")),
        tau = 0.5, horizon = Some(100L))
      .writeStream.format("memory").queryName("neardup_ttl_out")
      .outputMode("append").start()
    try {
      ms.addData((1L, text, 0L), (2L, text, 50L)) // in-horizon pair
      q.processAllAvailable()
      ms.addData((3L, text, 1000L)) // 1 and 2 are 950+ ms stale: no pair
      q.processAllAvailable()
      ms.addData((4L, text, 1050L)) // pairs with 3 only
      q.processAllAvailable()
      val pairs = spark.table("neardup_ttl_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 2L), (3L, 4L)),
        s"horizoned stream emitted $pairs")
    } finally q.stop()
  }

  test("watermark actually DROPS late data in append mode (bounded state is real)") {
    // controlled micro-batches via MemoryStream: batch 1 advances the
    // watermark (max 20:00 − 2h = 18:00) past the 10:00 window; batch
    // 2's 10:30 row is later than the watermark and must be DISCARDED,
    // not merged; batch 3 closes the 20:00 window. If expiry were not
    // enforced, the 10:00 window would show n=2 / sum=6.0.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s:00")
    val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = EventStreams.hourlyAggStream(
        ms.toDF.toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    try {
      ms.addData((t("10:15"), "click", 1.0), (t("20:00"), "click", 2.0))
      q.processAllAvailable()
      ms.addData((t("10:30"), "click", 5.0)) // LATE: watermark is 18:00
      q.processAllAvailable()
      ms.addData((t("23:30"), "click", 3.0)) // watermark → 21:30, closes 20:00
      q.processAllAvailable()
      val out = spark.table("wm_out")
        .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
      assert(out("2024-01-01 10:00") == ((1L, 1.0)),
        s"late row leaked into a closed window: $out")
      assert(out("2024-01-01 20:00") == ((1L, 2.0)))
      assert(!out.values.exists(_._2 == 6.0), s"late value merged: $out")
    } finally q.stop()
  }

  test("stateful sessionization carries state ACROSS micro-batches") {
    import graft.streaming.StatefulSessions
    import graft.streaming.StatefulSessions.SessState
    // batch 1 ends at t=100s; batch 2 starts 10s later (same session)
    // then jumps 1h (new session)
    val s1 = StatefulSessions.advance(None, Seq(0L, 100L * 1000000), gapSec = 1800)
    assert(s1 == SessState(100L * 1000000, 1, 2))
    val s2 = StatefulSessions.advance(Some(s1),
      Seq(110L * 1000000, 4000L * 1000000), gapSec = 1800)
    assert(s2.sessions == 2 && s2.events == 4)
    // a late event (before lastTs) is dropped, not merged into a session
    val s3 = StatefulSessions.advance(Some(s2), Seq(50L * 1000000), gapSec = 1800)
    assert(s3 == s2)
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

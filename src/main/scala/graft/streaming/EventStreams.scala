package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table (SURVEY.md
  * §2d). The transforms are defined once and applied to either a batch
  * or a streaming DataFrame — Structured Streaming's core contract —
  * so batch runs verify semantics against the DuckDB oracle and the
  * streaming test verifies incremental execution of the same plan.
  */
object EventStreams {

  /** Normalize `ts` to a session-zone TIMESTAMP regardless of how the
    * producer encoded it in parquet — the "run SQL on whatever the
    * parquet says" robustness contract. Encodings seen in the wild
    * (the driver's testdata has shipped both):
    *
    *   - int64 epoch-NANOS (parquet TIMESTAMP(NANOS) surfaced as
    *     LongType via `spark.sql.legacy.parquet.nanosAsLong`): nanos →
    *     micros must use INTEGER division — `col / 1000L` promotes to
    *     double, whose ~256ns ulp at epoch scale truncates to the
    *     wrong microsecond for ~13% of values (1µs earlier than
    *     DuckDB's exact ns-truncation, this conversion's parity
    *     contract).
    *   - parquet timestamp[us] with isAdjustedToUTC=false, which Spark
    *     reads as TIMESTAMP_NTZ: cast to TIMESTAMP — under the UTC
    *     session zone (all graft sessions) the wall clock is preserved
    *     exactly, matching DuckDB's naive-timestamp read.
    *   - TIMESTAMP (µs, UTC-adjusted): already the target type.
    */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType =>
      df.withColumn("ts", col("ts").cast(TimestampType))
    case TimestampType => df
    case other => throw new IllegalArgumentException(
      s"events.ts: unsupported type $other (expected int64-nanos, timestamp_ntz, or timestamp)")
  }

  /** Streaming read of an events directory. FileStreamSource needs an
    * explicit schema; take it from the files themselves (a one-off
    * footer read) so every ts encoding the batch path accepts streams
    * identically. */
  def readStream(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // an empty directory is a normal start state for file-stream
    // ingestion (files land after the stream is defined) — fall back
    // to the canonical events schema instead of failing the batch
    // inference read
    val fileSchema =
      try spark.read.parquet(path).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA")
              || e.getMessage.contains("PATH_NOT_FOUND") =>
          defaultEventsSchema
      }
    normalizeTs(spark.readStream.schema(fileSchema).parquet(path))
  }

  /** The driver testdata's events shape with the current-generation ts
    * encoding (timestamp[us]) — what an empty ingest directory will
    * contain once files land. */
  private[graft] val defaultEventsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", LongType),
      org.apache.spark.sql.types.StructField("ts", TimestampType),
      org.apache.spark.sql.types.StructField("user_id", LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))

  /** Tumbling-window aggregation: hourly counts + exact value sums per
    * event type. In streaming mode add `withWatermark` before this. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Watermarked streaming variant of [[hourlyAgg]]. */
  def hourlyAggStream(events: DataFrame): DataFrame =
    hourlyAgg(events.withWatermark("ts", "2 hours"))

  /** SLIDING-window aggregation: 1-hour windows every 15 minutes —
    * each event lands in exactly windowDuration/slide = 4 overlapping
    * windows (both engines align window starts to the epoch, so the
    * assignment is identical). The multi-window fan-out happens
    * map-side and partial aggregation combines before the (window,
    * type)-keyed shuffle, so the 4× row expansion never crosses the
    * wire unaggregated. */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Watermarked streaming variant of [[slidingAgg]] — state is
    * bounded at (watermark + window)/slide live windows per type. */
  def slidingAggStream(events: DataFrame): DataFrame =
    slidingAgg(events.withWatermark("ts", "2 hours"))

  /** Batch dedup twin (st_dedup): one keeper + duplicate count per
    * (user_id, event_type). The keeper is min(event_id) — a
    * deterministic representative the oracle can reproduce (streaming
    * keeps the first ARRIVAL; the key set is what both must agree on). */
  def dedupFirst(events: DataFrame): DataFrame =
    events.groupBy("user_id", "event_type")
      .agg(
        min(col("event_id")).as("first_event_id"),
        count(lit(1)).as("n_dupes"))

  /** Streaming exact-dedup with BOUNDED state: duplicates arriving
    * within the watermark delay are dropped, and per-key state expires
    * once the watermark passes — the only way streaming dedup survives
    * an unbounded key domain at 100 TB/day. */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Stream-stream INTERVAL JOIN (last-touch attribution shape): every
    * purchase pairs with the same user's clicks from the preceding 30
    * minutes. The join condition compares event-time COLUMNS with an
    * interval bound — the form Structured Streaming recognizes to
    * bound join state: with both sides watermarked
    * ([[attributionJoinStream]]), click state older than
    * watermark + 30min is evicted instead of accumulating forever.
    * Timestamps are micro-truncated by [[normalizeTs]], so the same
    * comparisons replay exactly in the oracle via CAST-to-TIMESTAMP. */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"),
      col("ts").as("click_ts"), col("event_id").as("click_id"))
    val p = purchases.select(col("user_id").as("user_id"),
      col("ts").as("purchase_ts"), col("event_id").as("purchase_id"))
    p.join(c,
      col("c_user") === col("user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") > col("purchase_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("click_id"), col("user_id"))
  }

  /** Watermarked streaming variant of [[attributionJoin]] — both sides
    * bounded so the runtime can expire join state. */
  def attributionJoinStream(clicks: DataFrame, purchases: DataFrame): DataFrame =
    attributionJoin(
      clicks.withWatermark("ts", "1 hour"),
      purchases.withWatermark("ts", "1 hour"))

  /** STREAM-STATIC enrichment join (the dimension-enrichment pass
    * every event pipeline runs): each event picks up its customer's
    * market segment. The static side is explicitly BROADCAST — the
    * shape that survives 100 TB/day: the fact stream never shuffles
    * for the join, every executor holds the dim snapshot, and under
    * Structured Streaming the static side is re-planned each
    * micro-batch (dim updates picked up without restarting the
    * query — the documented stream-static contract). LEFT join so
    * events without a dim row survive with a NULL segment instead of
    * silently dropping. The customer key is derived (1 + user_id %
    * 100) so the join hits at every SF; both engines compute it with
    * the same integer arithmetic. */
  def enrich(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
      broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
      col("c_custkey") === lit(1) + pmod(col("user_id"), lit(100)), "left")

  /** Streaming TOP-K (st_topk): the k most active users by event
    * count, exact value sums, ties broken by user_id so the cut is
    * total-order deterministic. In complete-mode streaming the sort +
    * limit run over the AGGREGATE (state bounded by distinct users,
    * the result re-emitted per micro-batch) — the live leaderboard
    * shape; the raw stream itself is never sorted. */
  def topUsers(events: DataFrame, k: Int): DataFrame =
    events.groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(k)

  /** Compact deterministic summary of [[enrich]]: events + exact value
    * sums per (segment, event_type). Works unchanged in batch and
    * (complete-mode) streaming. */
  def segmentAgg(enriched: DataFrame): DataFrame =
    enriched.groupBy(
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
}

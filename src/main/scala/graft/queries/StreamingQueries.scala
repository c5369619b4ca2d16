package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.streaming.EventStreams

/** SURVEY.md §2d — event-stream semantics, verified in batch mode
  * against the DuckDB oracle (identical plans run under Structured
  * Streaming in StreamingSpec).
  */
object StreamingQueries {

  val all: Seq[QueryDef] = Seq(

    // st44: tumbling-window aggregation (the same plan streams with a
    // watermark — EventStreams.hourlyAggStream).
    QueryDef.sql(
      "st_window_agg",
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M') AS hour_start,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin) { (s, dir) =>
      EventStreams.hourlyAgg(Tables.load(s, dir, "events"))
        .orderBy("hour_start", "event_type")
    },

    // st87 (round 5): SLIDING-window aggregation — 1-hour windows
    // every 15 minutes; each event lands in exactly 4 overlapping
    // windows (epoch-aligned in both engines: the oracle replays the
    // fan-out as time_bucket(15 min) minus j*15min for j in 0..3).
    // Map-side fan-out + partial agg keep the 4× expansion off the
    // wire; the streaming twin (watermarked) runs in StreamingSpec.
    QueryDef.sql(
      "st_sliding",
      """WITH e AS (
        |  SELECT event_type, value,
        |    time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) AS tb
        |  FROM events),
        |w AS (
        |  SELECT event_type, value,
        |    tb - unnest([0, 1, 2, 3]) * INTERVAL '15 minutes' AS ws
        |  FROM e)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M') AS window_start, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
      EventStreams.slidingAgg(Tables.load(s, dir, "events"))
        .orderBy("window_start", "event_type")
    },

    // st54: streaming exact-dedup — batch twin keeps a deterministic
    // representative per key; the streaming variant
    // (EventStreams.dedupStream, exercised in StreamingSpec) drops
    // in-watermark duplicates with bounded, expiring state.
    QueryDef.sql(
      "st_dedup",
      """SELECT user_id, event_type,
        |  CAST(MIN(event_id) AS BIGINT) AS first_event_id,
        |  COUNT(*) AS n_dupes
        |FROM events GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
      EventStreams.dedupFirst(Tables.load(s, dir, "events"))
        .orderBy("user_id", "event_type")
    },

    // st71 (round 4): stream-stream interval join — last-touch
    // attribution: purchases pair with same-user clicks from the
    // preceding 30 minutes. The batch twin is oracle-checked here; the
    // watermarked stream-stream variant (bounded join state) runs in
    // StreamingSpec and must emit the same pair set.
    QueryDef.sql(
      "st_join",
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
        |FROM events p JOIN events c
        |  ON c.user_id = p.user_id
        |  AND c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        |  AND CAST(c.ts AS TIMESTAMP) > CAST(p.ts AS TIMESTAMP) - INTERVAL 30 MINUTE
        |ORDER BY purchase_id, click_id""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      EventStreams.attributionJoin(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"))
        .orderBy("purchase_id", "click_id")
    },

    // st86 (round 5): stream-static enrichment join — events pick up
    // the customer's market segment from a BROADCAST static dim (the
    // fact stream never shuffles for the join; under Structured
    // Streaming the static side re-plans per micro-batch, so dim
    // updates flow without restarting). Batch twin oracle-checked
    // here; the streaming twin must emit the identical summary
    // (StreamingSpec).
    QueryDef.sql(
      "st_static_join",
      """SELECT coalesce(c_mktsegment, 'UNKNOWN') AS segment, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e LEFT JOIN customer c ON c.c_custkey = 1 + e.user_id % 100
        |GROUP BY 1, 2 ORDER BY segment, event_type""".stripMargin) { (s, dir) =>
      EventStreams.segmentAgg(EventStreams.enrich(
          Tables.load(s, dir, "events"), Tables.load(s, dir, "customer")))
        .orderBy("segment", "event_type")
    },

    // st45: sessionization — 30-min-gap sessions per user via event-time
    // ordering + lag. Gap arithmetic in whole seconds (both engines
    // floor sub-second precision identically).
    QueryDef.sql(
      "st_sessionize",
      """WITH gaps AS (
        |  SELECT user_id, ts,
        |    date_diff('second',
        |      LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        |      CAST(ts AS TIMESTAMP)) AS gap_s
        |  FROM events)
        |SELECT user_id,
        |  COUNT(*) AS n_events,
        |  CAST(1 + SUM(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM gaps GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.load(s, dir, "events")
        .withColumn("gap_s",
          unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          (lit(1) + sum(when(col("gap_s") > 1800, 1).otherwise(0))).cast("bigint").as("n_sessions"))
        .orderBy("user_id")
    },

    // st_topk (round 7): streaming TOP-K leaderboard — the k most
    // active users, re-emitted per micro-batch in complete mode. The
    // sort+limit run over the AGGREGATE (state bounded by distinct
    // users), never the raw stream; ties broken by user_id so the cut
    // is total-order deterministic in both engines. Streaming twin
    // equivalence in StreamingSpec.
    QueryDef.sql(
      "st_topk",
      """SELECT CAST(user_id AS BIGINT) AS user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id
        |ORDER BY n_events DESC, user_id LIMIT 5""".stripMargin) { (s, dir) =>
      EventStreams.topUsers(Tables.load(s, dir, "events"), 5)
    },

    // st_cdc (round 8): streaming CDC LATEST-STATE view — the change
    // stream folded into the current row per key, the materialized
    // upsert view every CDC pipeline serves (batch-merge half:
    // q43_merge_cdc). The batch twin is ONE partial-aggregable max_by
    // keyed by (ts, event_id) — no per-key window sort, so at 100 TB
    // the map side pre-combines to one candidate row per key per task
    // before the only shuffle. The streaming twin
    // (CdcState.latestStream, flatMapGroupsWithState, O(live keys)
    // state) must converge to the identical snapshot — proven across
    // multi-batch feeds in StreamingSpec.
    QueryDef.sql(
      "st_cdc",
      """SELECT user_id, event_id AS last_event_id,
        |  event_type AS last_event_type, value AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
      graft.streaming.CdcState.latestState(Tables.load(s, dir, "events"))
        .orderBy("user_id")
    },

    // st_neardup (round 9): STREAMING near-duplicate detection — the
    // streaming counterpart the dd_ family lacked (st_dedup is
    // exact-key only). Batch twin: estimate-verified MinHash pairs at
    // tau=0.5 — only signatures ever reach a pair (the at-scale
    // verification contract dd_minhash_est measured; exact shingle
    // sets appear nowhere). Streaming twin: each micro-batch
    // MinHash-signs scan-locally and compares against
    // flatMapGroupsWithState band-key state (the signature store AS
    // state — streaming/MinHashDedup.scala), proven convergent to this
    // batch answer over multi-batch feeds incl. cross-batch pairs in
    // StreamingSpec. Oracle replays signatures + band collisions +
    // the n/64 estimate exactly.
    QueryDef.sql(
      "st_neardup", {
        import OracleSql._
        s"""WITH toks AS (
           |  SELECT doc_id, ${tokens("text")} AS t FROM documents
           |), sh AS (
           |  SELECT doc_id, ${shingles3("t")} AS sh FROM toks
           |), ${minhashBandCtes("sh", 64, 4)}, pairs AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bk a JOIN bk b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
           |), est AS (
           |  SELECT p.doc_a, p.doc_b,
           |    CAST(SUM(CASE WHEN sa.c = sb.c THEN 1 ELSE 0 END) AS DOUBLE) / 64
           |      AS est_jaccard
           |  FROM pairs p
           |  JOIN sig sa ON sa.doc_id = p.doc_a
           |  JOIN sig sb ON sb.doc_id = p.doc_b AND sb.p = sa.p
           |  GROUP BY p.doc_a, p.doc_b
           |)
           |SELECT doc_a, doc_b, est_jaccard FROM est
           |WHERE est_jaccard >= 0.5
           |ORDER BY doc_a, doc_b""".stripMargin
      }) { (s, dir) =>
      graft.streaming.MinHashDedup
        .pairsBatch(Tables.load(s, dir, "documents"), 64, 4, 0.5)
        .orderBy("doc_a", "doc_b")
    }
  )
}

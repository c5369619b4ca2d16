package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.TemporalOps

/** SURVEY.md §2 rounds-3 additions — temporal joins Spark lacks as
  * built-ins (as-of join, sliding-lookback range join), implemented
  * shuffle-window-style ([[TemporalOps]]) and hash-checked against
  * DuckDB (whose native ASOF JOIN / inequality join are the oracles).
  */
object TemporalQueries {

  val all: Seq[QueryDef] = Seq(

    // q31: as-of join — each click enriched with the user's latest
    // prior (or simultaneous) view. Oracle: DuckDB's native ASOF JOIN
    // (inner flavor — clicks with no prior view drop on both sides).
    QueryDef.sql(
      "q31_asof",
      """SELECT c.event_id, c.user_id,
        |  epoch_us(CAST(c.ts AS TIMESTAMP)) AS click_us, c.value AS click_value,
        |  epoch_us(CAST(v.ts AS TIMESTAMP)) AS view_us, v.value AS view_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val views = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts", "value")
      TemporalOps.asofJoin(clicks, views, "user_id", "ts",
          tieBreak = Some("event_id"))
        .filter(col("asof_event_id").isNotNull) // inner ASOF semantics
        .select(
          col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("click_us"), col("value").as("click_value"),
          unix_micros(col("asof_ts")).as("view_us"), col("asof_value").as("view_value"))
        .orderBy("event_id")
    },

    // q32: sliding-lookback range join — per error event, the count
    // and value-sum of the same user's clicks in the strictly-prior
    // 10 minutes. Oracle: DuckDB inequality join + group; the Spark
    // plan is ONE range-frame window (no O(n·m) inequality join).
    QueryDef.sql(
      "q32_lookback",
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
        |  FROM events WHERE event_type = 'error'
        |), c AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t, value
        |  FROM events WHERE event_type = 'click'
        |)
        |SELECT e.event_id, e.user_id,
        |  CAST(COUNT(c.t) AS BIGINT) AS lookback_count,
        |  CAST(SUM(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS lookback_sum
        |FROM e LEFT JOIN c
        |  ON c.user_id = e.user_id AND c.t >= e.t - 600000000 AND c.t < e.t
        |GROUP BY e.event_id, e.user_id ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .filter(col("event_type").isin("error", "click"))
      TemporalOps.lookbackStats(
          ev, "user_id", unix_micros(col("ts")),
          isLeft = col("event_type") === "error",
          isRight = col("event_type") === "click",
          valueCol = col("value").cast("decimal(18,2)"),
          lookbackUs = 600000000L)
        .select(col("event_id"), col("user_id"), col("lookback_count"),
          col("lookback_sum").cast("double").as("lookback_sum"))
        .orderBy("event_id")
    },

    // q42 (round 5): KEY-LESS interval join — per error event, count +
    // value-sum of ALL clicks (any user) in the strictly-prior 5
    // minutes. No equi key exists, so q32's keyed range window doesn't
    // apply and a naive inequality join is a BroadcastNestedLoopJoin;
    // the operator decomposes into time bins of exactly the window
    // width (left side exploded ×2, equi-join on bin, residual range
    // filter) — audited in PlanAuditSpec as hash-join-only. Oracle:
    // DuckDB's native inequality join (IEJoin) over the same range.
    QueryDef.sql(
      "q42_range_join",
      """WITH e AS (
        |  SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
        |  FROM events WHERE event_type = 'error'
        |), c AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS t, value
        |  FROM events WHERE event_type = 'click'
        |)
        |SELECT e.event_id,
        |  CAST(COUNT(c.t) AS BIGINT) AS nearby_clicks,
        |  CAST(SUM(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS nearby_value
        |FROM e LEFT JOIN c ON c.t >= e.t - 300000000 AND c.t < e.t
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("ts"))
      val clk = ev.filter(col("event_type") === "click")
      TemporalOps.intervalBinStats(
          err, Seq("event_id"), unix_micros(col("ts")),
          clk, unix_micros(col("ts")),
          valueCol = col("value").cast("decimal(18,2)"),
          windowUs = 300000000L)
        .select(col("event_id"), col("range_count").as("nearby_clicks"),
          col("range_sum").cast("double").as("nearby_value"))
        .orderBy("event_id")
    },

    // q44 (round 5): SCD2 history construction — turn a change stream
    // (each user's 'view' events as attribute versions) into the
    // type-2 slowly-changing-dimension shape: per key, each version
    // carries [valid_from, valid_to) with valid_to = the next
    // version's start (NULL = current). One keyed window (shuffle on
    // user_id, sort by time) — the same partitioned-lead shape at any
    // scale; no self-join, no global sort. Oracle: identical window
    // SQL in DuckDB.
    QueryDef.sql(
      "q44_scd2",
      """SELECT user_id, CAST(row_number() OVER w AS BIGINT) AS version,
        |  value AS val,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from_us,
        |  lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS valid_to_us,
        |  lead(ts) OVER w IS NULL AS is_current
        |FROM events WHERE event_type = 'view'
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.load(s, dir, "events")
        .filter(col("event_type") === "view")
        .select(col("user_id"),
          row_number().over(w).cast("long").as("version"),
          col("value").as("val"),
          unix_micros(col("ts")).as("valid_from_us"),
          lead(unix_micros(col("ts")), 1).over(w).as("valid_to_us"),
          lead(col("ts"), 1).over(w).isNull.as("is_current"))
        .orderBy("user_id", "version")
    }
  )
}

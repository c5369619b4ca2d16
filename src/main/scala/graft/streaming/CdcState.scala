package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC LATEST-STATE materialization (SURVEY.md §2d st_cdc):
  * fold a change stream into the current row per key — the streaming
  * half of the CDC story whose batch half is q43_merge_cdc. The batch
  * twin ([[latestState]]) is a single partial-aggregable `max_by`
  * (no window sort: at 100 TB a per-key row_number would sort every
  * partition; `max_by` combines map-side and shuffles one row per key
  * per map task). The streaming twin keeps one small state record per
  * key via `flatMapGroupsWithState` and re-emits the key's current
  * row whenever it advances (Update mode) — state size is O(live
  * keys), independent of stream length.
  */
object CdcState {

  final case class Change(
      user_id: Long, event_id: Long, event_type: String,
      value: Double, tsMicros: Long)
  final case class Latest(
      tsMicros: Long, eventId: Long, eventType: String, value: Double)
  final case class LatestRow(
      user_id: Long, last_event_id: Long, last_event_type: String,
      last_value: Double)

  /** Newer-than ordering: event time, then event_id (unique) — the
    * same total order the batch twin's `max_by` struct key uses, so
    * arrival order can never change the answer. */
  private def newer(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 > b._2)

  /** Fold a batch of changes into the state; returns the new state
    * only if it advanced (late/duplicate changes don't re-emit).
    * Takes the changes as a one-pass iterator so a hot key's
    * micro-batch never buffers in memory — per-key state is O(1). */
  def advance(state: Option[Latest], changes: IterableOnce[Change]): Option[Latest] =
    changes.iterator.foldLeft(Option.empty[Latest]) { (acc, c) =>
      val cur = acc.orElse(state)
      if (cur.forall(s => newer((c.tsMicros, c.event_id), (s.tsMicros, s.eventId))))
        Some(Latest(c.tsMicros, c.event_id, c.event_type, c.value))
      else acc
    }

  /** events frame (batch or stream) → typed change rows. */
  def changesOf(events: DataFrame): Dataset[Change] = {
    implicit val enc = Encoders.product[Change]
    events.select(
        col("user_id"), col("event_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[Change]
  }

  /** Streaming (or batch) latest-state view: one current row per key,
    * re-emitted per micro-batch in Update mode whenever it advances. */
  def latestStream(changes: Dataset[Change]): Dataset[LatestRow] = {
    implicit val stateEnc = Encoders.product[Latest]
    implicit val outEnc = Encoders.product[LatestRow]
    implicit val longEnc = Encoders.scalaLong
    changes
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Latest, LatestRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, cs: Iterator[Change], state: GroupState[Latest]) =>
          advance(state.getOption, cs) match {
            case Some(next) =>
              state.update(next)
              Iterator.single(
                LatestRow(uid, next.eventId, next.eventType, next.value))
            case None => Iterator.empty
          }
      }
  }

  /** Batch twin (the oracle-checked shape): latest row per key by
    * (ts, event_id), as one partial-aggregable `max_by`. */
  def latestState(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(max_by(
        struct(col("event_id"), col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("last"))
      .select(
        col("user_id"),
        col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_event_type"),
        col("last.value").as("last_value"))
}

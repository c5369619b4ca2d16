package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` (SURVEY.md §2d):
  * per-user session tracking that survives across micro-batches —
  * the Structured Streaming mechanism for state the built-in windowed
  * aggregations can't express (the reference has no streaming story;
  * this is part of graft's beyond-the-reference pipeline surface).
  *
  * State per user: running session count + last-seen event time.
  * An event more than `gapSec` after the last one opens a new session.
  * Emits the updated (user, sessions, events) row per batch (Update
  * mode). The same `advance` logic runs in batch mode for equivalence
  * testing against the oracle-checked lag-based st_sessionize.
  */
object StatefulSessions {

  final case class Ev(user_id: Long, tsMicros: Long)
  final case class SessState(lastTs: Long, sessions: Int, events: Long)
  final case class SessionUpdate(user_id: Long, sessions: Int, events: Long)

  val DefaultGapSec = 1800L

  /** Fold a time-ordered batch of event times into the state.
    *
    * Events at or before the state's last timestamp are LATE — a prior
    * micro-batch already advanced past them. They are dropped (the
    * standard no-watermark policy): counting them against the stale
    * lastTs would silently merge sessions and diverge from the batch
    * semantics. Production streams should additionally
    * `withWatermark` upstream so lateness is bounded. */
  def advance(state: Option[SessState], sortedTs: Seq[Long], gapSec: Long): SessState =
    sortedTs.foldLeft(state.getOrElse(SessState(Long.MinValue, 0, 0L))) { (s, t) =>
      if (s.sessions > 0 && t <= s.lastTs) s // late event: drop
      else {
        val newSession = s.sessions == 0 ||
          (t / 1000000L - s.lastTs / 1000000L) > gapSec
        SessState(t, s.sessions + (if (newSession) 1 else 0), s.events + 1)
      }
    }

  /** Streaming (or batch) sessionization over (user_id, tsMicros). */
  def sessionize(events: Dataset[Ev], gapSec: Long = DefaultGapSec): Dataset[SessionUpdate] = {
    implicit val stateEnc = Encoders.product[SessState]
    implicit val outEnc = Encoders.product[SessionUpdate]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          val sortedTs = evs.map(_.tsMicros).toSeq.sorted
          if (sortedTs.isEmpty) Iterator.empty
          else {
            val next = advance(state.getOption, sortedTs, gapSec)
            state.update(next)
            Iterator.single(SessionUpdate(uid, next.sessions, next.events))
          }
      }
  }
}

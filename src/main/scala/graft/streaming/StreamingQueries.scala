package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming query operators over event streams — the Structured-Streaming
  * side of the engine (SURVEY.md §2.12: the reference itself has no
  * streaming operators, its "real-time" is ingest + refresh; these are the
  * stream-processing operators a training-data/eventing pipeline needs on
  * top, expressed with watermarks + windowed state so they run identically
  * on a 1000-executor cluster).
  */
object StreamingQueries {

  /** Tumbling-window counts with a watermark: state for a window is dropped
    * once the watermark passes it, so state size is bounded by
    * (watermark horizon / window width) × #event types regardless of
    * stream length. */
  def windowedCounts(events: DataFrame, windowWidth: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowWidth), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("bigint")).as("value_cents"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("value_cents"))

  final case class SessionEvent(user_id: Long, ts_epoch: Long)
  final case class SessionState(sessionCount: Int, lastTs: Long, events: Long)
  final case class UserSessions(user_id: Long, n_sessions: Int, n_events: Long)

  /** Per-user sessionization with custom state (flatMapGroupsWithState) —
    * the streaming analogue of the batch lag+running-sum sessionize
    * (Relational.q14): a gap over `gapSeconds` opens a new session. Emits
    * the running (user, sessions, events) row on every update; state is one
    * small struct per user (callers bounding state on unbounded key spaces
    * add a GroupStateTimeout and drop idle users). */
  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long = 1800)
      : Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          var s = state.getOption.getOrElse(SessionState(0, Long.MinValue, 0L))
          rows.toSeq.sortBy(_.ts_epoch).foreach { e =>
            val newSession = s.lastTs == Long.MinValue || e.ts_epoch - s.lastTs > gapSeconds
            s = SessionState(
              s.sessionCount + (if (newSession) 1 else 0),
              math.max(s.lastTs, e.ts_epoch),
              s.events + 1)
          }
          state.update(s)
          Iterator(UserSessions(user, s.sessionCount, s.events))
      }
  }
}

package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming transform surface beyond the ingest loop (builder brief:
  * "watermarks + windowed aggs; mapGroupsWithState/flatMapGroupsWithState
  * for custom state").
  *
  * Scale: watermarks bound both the windowed-agg state (one row per open
  * window per key) and the session state (one SessionState per active user);
  * state lives in the HDFS-backed state store partitioned by key — no
  * driver-side accumulation.
  */
object Sessionize {

  /** Tumbling 1-day windowed counts with a watermark — works identically on
    * a streaming or batch DataFrame (same declarative plan).
    */
  def dailyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("day_window"), col("event_type"))
      .agg(count(lit(1)).as("event_count"))
      .select(
        col("day_window.start").as("window_start"),
        col("event_type"), col("event_count"))

  case class Evt(user_id: Long, ts: Timestamp)
  case class SessionState(start: Long, last: Long, n: Int)
  case class UserSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int)

  /** Gap-based sessionization via flatMapGroupsWithState: a session closes
    * when no event arrives within `gapMs` (event-time timeout). Emits closed
    * sessions; open sessions stay in state.
    */
  def sessionize(events: Dataset[Evt], gapMs: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, evts: Iterator[Evt], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(UserSession(userId, new Timestamp(s.start), new Timestamp(s.last), s.n))
          } else {
            val sorted = evts.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[UserSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed ::= UserSession(userId, new Timestamp(s.start), new Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // clamp above the watermark: setTimeoutTimestamp rejects
              // timestamps <= watermark (a very late batch would otherwise
              // kill the query instead of closing the session next trigger)
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(s.last + gapMs, wm + 1))
            }
            closed.reverseIterator
          }
        })
  }
}

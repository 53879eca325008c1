package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
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

  /** `sessionize_batch`: the declarative batch twin of [[sessionize]] — the
    * same gap rule (a session breaks when the inter-event gap exceeds
    * `gapMinutes`), expressed as lag → new-session flag → running sum →
    * group. SessionizeSpec asserts the two implementations agree on closed
    * sessions, and the DuckDB oracle proves this one exactly.
    *
    * Scale: ONE shuffle total — the window partitions by user_id, and the
    * following groupBy(user_id, session_idx) is satisfied by the same hash
    * partitioning (user_id is a prefix), so Catalyst plans no second
    * exchange. Per-user state is O(1) (lag-1 + running sum); session ids are
    * per-user ordinals, deterministic under any partitioning. Gap timestamps
    * compare in exact integer microseconds.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(order))
      .withColumn("new_session",
        (col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs).cast("long"))
      .withColumn("session_idx",
        sum(col("new_session")).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("duration_us"))
  }

  val oracles: Map[String, String] = Map(
    "sessionize_batch" ->
      """WITH l AS (
        |  SELECT user_id, ts, event_id,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN prev_ts IS NULL
        |                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |              THEN 1 ELSE 0 END AS ns
        |  FROM l),
        |s AS (
        |  SELECT user_id, ts,
        |         SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM f)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |       MIN(ts) AS session_start, MAX(ts) AS session_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT) AS duration_us
        |FROM s GROUP BY user_id, session_idx""".stripMargin
  )
}

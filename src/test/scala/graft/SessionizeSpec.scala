package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Evt, UserSession}

/** Streaming windowed aggregation + stateful sessionization, driven through
  * a real MemoryStream query (not batch emulation).
  */
class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  test("watermarked tumbling window counts (same plan, batch input)") {
    val df = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), "click"),
      (Timestamp.valueOf("2024-01-01 23:59:00"), "click"),
      (Timestamp.valueOf("2024-01-02 00:01:00"), "click"),
      (Timestamp.valueOf("2024-01-01 12:00:00"), "view")
    ).toDF("ts", "event_type")
    val out = Sessionize.dailyTypeCounts(df)
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("2024-01-01 00:00:00.0", "click")) == 2L)
    assert(out(("2024-01-02 00:00:00.0", "click")) == 1L)
    assert(out(("2024-01-01 00:00:00.0", "view")) == 1L)
  }

  test("flatMapGroupsWithState closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Evt]
    val sessions = Sessionize.sessionize(input.toDS(), gapMs = 30 * 60 * 1000)

    val query = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // user 9: two events close together, then a long gap, then one more
      input.addData(
        Evt(9L, Timestamp.valueOf("2024-01-01 10:00:00")),
        Evt(9L, Timestamp.valueOf("2024-01-01 10:10:00")))
      query.processAllAvailable()
      input.addData(Evt(9L, Timestamp.valueOf("2024-01-01 14:00:00")))
      query.processAllAvailable()
      // advance watermark far past the session-close horizon
      input.addData(Evt(7L, Timestamp.valueOf("2024-01-02 10:00:00")))
      query.processAllAvailable()

      val closed = spark.table("sessions_out").as[UserSession].collect()
      val u9 = closed.filter(_.user_id == 9L)
      assert(u9.exists(s =>
        s.session_start == Timestamp.valueOf("2024-01-01 10:00:00") &&
          s.session_end == Timestamp.valueOf("2024-01-01 10:10:00") && s.n_events == 2),
        s"expected first session of user 9 closed, got ${closed.toSeq}")

      // the declarative batch twin must agree on every CLOSED session
      // (streaming holds the final open session of each user in state)
      val batchIn = Seq(
        (0L, Timestamp.valueOf("2024-01-01 10:00:00"), 9L),
        (1L, Timestamp.valueOf("2024-01-01 10:10:00"), 9L),
        (2L, Timestamp.valueOf("2024-01-01 14:00:00"), 9L),
        (3L, Timestamp.valueOf("2024-01-02 10:00:00"), 7L)
      ).toDF("event_id", "ts", "user_id")
      val batch = Sessionize.sessionizeBatch(batchIn)
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect()
        .map(t => UserSession(t._1, t._2, t._3, t._4.toInt)).toSet
      assert(closed.toSet.subsetOf(batch),
        s"closed streaming sessions ${closed.toSeq} must appear in batch ${batch.toSeq}")
    } finally query.stop()
  }

  test("sessionize_batch breaks sessions strictly past the gap") {
    val df = Seq(
      (0L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
      (1L, Timestamp.valueOf("2024-01-01 10:30:00"), 1L), // exactly 30min: same session
      (2L, Timestamp.valueOf("2024-01-01 11:00:01"), 1L)  // 30min 1s: new session
    ).toDF("event_id", "ts", "user_id")
    val out = Sessionize.sessionizeBatch(df).orderBy("session_idx")
      .select("session_idx", "n_events", "duration_us")
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L, 30L * 60 * 1000000), (2L, 1L, 0L)))
  }
}

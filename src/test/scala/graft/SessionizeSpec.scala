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
    } finally query.stop()
  }
}

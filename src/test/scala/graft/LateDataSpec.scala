package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Sessionize

/** The watermark's late-data DROP contract behind `stream_late_data_endstate`
  * (Sessionize.streamLateDataEndstate), driven through a real MemoryStream
  * query: rows whose day window ended below the advanced watermark must be
  * discarded by the windowed aggregate, and — the counterfactual that makes
  * the drop meaningful — the SAME probe rows stamped on time must appear.
  */
class LateDataSpec extends SparkTestBase {
  import spark.implicits._

  private def runQuery(name: String)(drive: MemoryStream[(Timestamp, String)]
      => org.apache.spark.sql.streaming.StreamingQuery => Unit)
      : Map[(String, String), Long] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = Sessionize.dailyTypeCounts(input.toDF().toDF("ts", "event_type"))
    val q = counts.writeStream
      .format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try drive(input)(q)
    finally q.stop()
    spark.table(name).collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2))
      .toMap
  }

  private val onTime = Seq(
    (Timestamp.valueOf("2024-01-10 10:00:00"), "click"),
    (Timestamp.valueOf("2024-01-10 11:00:00"), "click"),
    (Timestamp.valueOf("2024-01-10 12:00:00"), "view"))
  // probes dated 9 days BEFORE the on-time data — far below the watermark
  // once the advancer lands
  private val lateProbes = Seq(
    (Timestamp.valueOf("2024-01-01 00:00:00"), "__late"),
    (Timestamp.valueOf("2024-01-01 00:00:01"), "__late"))
  private val advancer = (Timestamp.valueOf("2024-02-10 00:00:00"), "advance")
  private val closer = (Timestamp.valueOf("2024-03-10 00:00:00"), "close")

  test("rows below the advanced watermark are dropped") {
    val out = runQuery("late_drop_out") { input => q =>
      input.addData(onTime); q.processAllAvailable()
      // watermark is computed from the PREVIOUS batch's max event time, so
      // the advancer needs its own batch before the probes arrive
      input.addData(advancer); q.processAllAvailable()
      input.addData(lateProbes); q.processAllAvailable()
      input.addData(closer); q.processAllAvailable()
    }
    assert(out(("2024-01-10 00:00:00.0", "click")) == 2L)
    assert(out(("2024-01-10 00:00:00.0", "view")) == 1L)
    assert(!out.keySet.exists(_._2 == "__late"),
      s"late probes leaked into closed output: $out")
  }

  test("the same probes stamped on time DO appear") {
    val punctual = lateProbes.map { case (_, t) =>
      (Timestamp.valueOf("2024-01-10 09:00:00"), t) }
    val out = runQuery("late_ontime_out") { input => q =>
      input.addData(onTime ++ punctual); q.processAllAvailable()
      input.addData(advancer); q.processAllAvailable()
      input.addData(closer); q.processAllAvailable()
    }
    assert(out(("2024-01-10 00:00:00.0", "__late")) == 2L,
      s"on-time probes missing from output: $out")
    assert(out(("2024-01-10 00:00:00.0", "click")) == 2L)
  }
}

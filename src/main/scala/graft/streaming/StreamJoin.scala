package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** STREAM-STREAM interval join — the last Structured Streaming join class
  * in the engine (upsert / sessionize / windowed agg / dedup / stream-static
  * enrich are the others): two live streams joined on a key plus an event-
  * time bound, the shape behind real-time attribution ("which error landed
  * within the hour before this click").
  *
  * Both sides carry a watermark and the join predicate bounds event-time
  * distance in BOTH directions, so Spark can size the join state: each side
  * buffers only rows inside (watermark − interval), and state eviction is
  * driven by the watermarks — without the time bound the state would grow
  * unboundedly and Spark rejects the query. INNER join semantics emit each
  * match as soon as both rows exist; no watermark-flush sentinel is needed
  * (an OUTER stream-stream join would need one, exactly like the windowed
  * aggregates).
  *
  * Scale: state is (rows within the interval horizon) per side, hash-
  * partitioned on the join key — the same key-skew discipline as any
  * shuffle join applies, and the interval length is the state-size knob.
  */
object StreamJoin {

  /** Clicks joined to the errors of the SAME user within the hour before
    * the click — both sides streaming, inner, interval-bounded.
    */
  def clickErrorAttribution(clicks: DataFrame, errors: DataFrame): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val e = errors
      .select(col("event_id").as("error_id"), col("user_id").as("err_user"),
        col("ts").as("error_ts"))
      .withWatermark("error_ts", "1 hour")
    c.join(e,
      col("user_id") === col("err_user") &&
        col("error_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
        col("error_ts") <= col("click_ts"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("error_id"), col("error_ts"))
  }

  /** [[clickErrorAttribution]] with LEFT OUTER semantics: clicks with NO
    * error in their window still emit, with nulls. Outer stream-stream
    * joins are the delayed case: a match emits eagerly, but an UNMATCHED
    * click can only emit once the error-side watermark passes the click's
    * whole interval (no qualifying error can arrive anymore) — so the end
    * state needs the watermark to advance past the data, which the demo
    * drives with sentinel drops (the sessionize flush discipline).
    */
  def clickErrorAttributionOuter(clicks: DataFrame, errors: DataFrame): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val e = errors
      .select(col("event_id").as("error_id"), col("user_id").as("err_user"),
        col("ts").as("error_ts"))
      .withWatermark("error_ts", "1 hour")
    c.join(e,
      col("user_id") === col("err_user") &&
        col("error_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
        col("error_ts") <= col("click_ts"),
      "left_outer")
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("error_id"), col("error_ts"))
  }

  /** `stream_outer_join_endstate`: the outer variant driven end-to-end —
    * one data batch, then TWO sentinel batches, all inside one AvailableNow
    * lifecycle: watermarks are computed from the PREVIOUS batch's max event
    * time, so the first sentinel wave plants the advanced watermark and the
    * second wave's batch actually evaluates it, flushing every unmatched
    * click with nulls. The oracle is the batch LEFT JOIN on the same
    * interval predicate.
    */
  def streamOuterJoinEndstate(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.Tables
    import StreamHarness.land
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val scratch = StreamHarness.freshScratch("stream_ssouter", sfDir)
    val (srcC, srcE) = (s"$scratch/clicks", s"$scratch/errors")
    val outDir = s"$scratch/out"
    val ckpt = s"$scratch/ckpt"
    new java.io.File(srcC).mkdirs()
    new java.io.File(srcE).mkdirs()

    val base = events.select(col("event_id"), col("ts"), col("user_id"))
    def runOnce(): Unit = {
      // maxFilesPerTrigger=1: AvailableNow slices the pending files into
      // one micro-batch each, so both sentinel waves flush inside ONE
      // query lifecycle (watermarks are computed from the previous batch —
      // wave 2's batch evaluates wave 1's watermark) instead of paying a
      // full start/stop per wave
      val q = clickErrorAttributionOuter(
        spark.readStream.schema(base.schema)
          .option("maxFilesPerTrigger", "1").parquet(srcC),
        spark.readStream.schema(base.schema)
          .option("maxFilesPerTrigger", "1").parquet(srcE))
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .format("parquet")
        .option("path", outDir)
        .start()
      q.awaitTermination()
    }

    val clicks = events.where(col("event_type") === "click").select(base.columns.map(col): _*)
    val errors = events.where(col("event_type") === "error").select(base.columns.map(col): _*)
    val maxUs = events.agg(max(unix_micros(col("ts")))).head().getLong(0)
    def sentinel(daysOut: Long) = spark.range(1).select(
      lit(-1L).as("event_id"),
      timestamp_micros(lit(maxUs + daysOut * 24 * 3600 * 1000000L)).as("ts"),
      lit(-1L).as("user_id"))
    // ONE lifecycle for data + both sentinel waves: maxFilesPerTrigger=1
    // slices the three landed files per source into micro-batches
    // (c1+e1 data, then wave 1 plants the advanced watermark, then wave
    // 2's batch evaluates it and flushes unmatched clicks) — the
    // pinned-mtime land order is the batch order
    StreamHarness.withDemoStreamConfs(spark) {
      // all six drops are computable up front (maxUs already collected);
      // overlap their single-task writes — order rides the pinned mtimes
      StreamHarness.landAll(
        () => land(clicks, scratch, srcC, "c1", order = 0),
        () => land(errors, scratch, srcE, "e1", order = 0),
        () => land(sentinel(30), scratch, srcC, "c2", order = 1),
        () => land(sentinel(30), scratch, srcE, "e2", order = 1),
        () => land(sentinel(31), scratch, srcC, "c3", order = 2),
        () => land(sentinel(31), scratch, srcE, "e3", order = 2))
      runOnce()
    }

    spark.read.parquet(outDir)
      .where(col("user_id") >= 0) // the sentinel click's own unmatched row
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("error_id"), col("error_ts"))
  }

  /** `stream_stream_join_endstate`: the join driven end-to-end — clicks and
    * errors land as SEPARATE file streams (split across two drops each, so
    * matches must pair rows from different micro-batches out of the
    * buffered join state, not just within one batch — `maxFilesPerTrigger=1`
    * makes each drop its own micro-batch) in one AvailableNow run, append
    * sink. The end state must equal the batch
    * interval join — the oracle.
    */
  def streamStreamJoinEndstate(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.Tables
    import StreamHarness.land
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val scratch = StreamHarness.freshScratch("stream_ssjoin", sfDir)
    val (srcC, srcE) = (s"$scratch/clicks", s"$scratch/errors")
    val outDir = s"$scratch/out"
    val ckpt = s"$scratch/ckpt"
    new java.io.File(srcC).mkdirs()
    new java.io.File(srcE).mkdirs()

    val base = events.select(col("event_id"), col("ts"), col("user_id"))
    def runOnce(): Unit = {
      val clicks = spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcC)
      val errors = spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcE)
      val q = clickErrorAttribution(clicks, errors)
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .format("parquet")
        .option("path", outDir)
        .start()
      q.awaitTermination()
    }

    val clicks = events.where(col("event_type") === "click").select(base.columns.map(col): _*)
    val errors = events.where(col("event_type") === "error").select(base.columns.map(col): _*)
    // the drops split the TIMELINE, not the id space: run 2's rows must all
    // sit above run 1's advanced watermark or the engine rightly drops them
    // as late (the oracle is the complete batch join, so nothing may drop).
    // Cross-boundary pairs — a run-2 click matching a run-1 error within
    // the hour — can only come from the buffered join state, which is what
    // the two-run split is exercising. Bounded driver scalar, same
    // discipline as the sessionize sentinel.
    val Array(minUs, maxUs) = events
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val midTs = timestamp_micros(lit((minUs + maxUs) / 2))
    // one lifecycle, two micro-batches per source (maxFilesPerTrigger=1,
    // pinned land order): cross-boundary pairs — a batch-2 click matching
    // a batch-1 error within the hour — still come only from the buffered
    // join state, which is what the timeline split exercises
    StreamHarness.withDemoStreamConfs(spark) {
      StreamHarness.landAll(
        () => land(clicks.where(col("ts") < midTs), scratch, srcC, "c1", order = 0),
        () => land(errors.where(col("ts") < midTs), scratch, srcE, "e1", order = 0),
        () => land(clicks.where(col("ts") >= midTs), scratch, srcC, "c2", order = 1),
        () => land(errors.where(col("ts") >= midTs), scratch, srcE, "e2", order = 1))
      runOnce()
    }

    spark.read.parquet(outDir)
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("error_id"), col("error_ts"))
  }

  val oracles: Map[String, String] = Map(
    // end state == the batch LEFT interval join: matched rows eagerly,
    // unmatched clicks flushed by the sentinel-advanced watermark
    "stream_outer_join_endstate" ->
      """SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
        |       e.event_id AS error_id, e.ts AS error_ts
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
        |  ON c.user_id = e.user_id
        | AND e.ts >= c.ts - INTERVAL 1 HOUR
        | AND e.ts <= c.ts""".stripMargin,
    // end state == the batch interval join, row for row
    "stream_stream_join_endstate" ->
      """SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
        |       e.event_id AS error_id, e.ts AS error_ts
        |FROM events c JOIN events e
        |  ON c.event_type = 'click' AND e.event_type = 'error'
        | AND c.user_id = e.user_id
        | AND e.ts >= c.ts - INTERVAL 1 HOUR
        | AND e.ts <= c.ts""".stripMargin
  )
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.operators.Merge

/** Structured-Streaming expression of the reference's freshness model
  * (SURVEY.md §2.10): the reference has no streaming runtime — daily cron
  * re-reads a trailing window and MERGE-upserts idempotently
  * (CLAUDE.md:66-68, lib/bigquery.py:203-212). The honest Spark mapping:
  *
  *   file source → withWatermark + dropDuplicates(pk) → foreachBatch upsert
  *
  * `Trigger.AvailableNow` makes each run an incremental batch over newly
  * arrived files — exactly the cron-driven sync loop, but with exactly-once
  * bookkeeping from the checkpoint instead of MERGE idempotence alone (the
  * upsert keeps it idempotent even if the checkpoint is lost).
  *
  * Scale: state for dropDuplicates is bounded by the watermark horizon;
  * the foreachBatch upsert is the same anti-join+union as batch Merge —
  * one shuffle per micro-batch on the pk.
  */
object IncrementalSync {

  /** Run one AvailableNow incremental sync from `srcDir` (parquet drops)
    * into `targetPath`, upserting on `pk`. Returns the final target.
    */
  def syncOnce(
      spark: SparkSession,
      schema: StructType,
      srcDir: String,
      targetPath: String,
      checkpoint: String,
      pk: String,
      tsCol: String): DataFrame = {

    // dedup on (pk, ts): identical re-deliveries are suppressed by stream
    // state, while a *new version* of a key (same pk, later ts) passes
    // through and wins in the upsert — keying state on pk alone would
    // swallow updates across runs
    val stream = spark.readStream
      .schema(schema)
      .parquet(srcDir)
      .withWatermark(tsCol, "1 day")
      .dropDuplicates(Seq(pk, tsCol))

    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // defensive keep-latest per pk (stg_hn__comments.sql:5-11): a replay
        // batch can carry several versions of a key; MERGE needs one
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(pk).orderBy(col(tsCol).desc)
        val latest = batch.withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1).drop("__rn")
        val exists = new java.io.File(targetPath).exists()
        val merged =
          if (exists)
            Merge.mergeUpsert(spark.read.parquet(targetPath), latest, Seq(pk))
          else latest
        // write-to-temp-then-swap: never overwrite the file being read
        // (SURVEY §7.5.7 read-before-overwrite trap)
        val tmp = targetPath + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        val t = new java.io.File(targetPath)
        delete(t)
        new java.io.File(tmp).renameTo(t)
        ()
      }
      .start()
    query.awaitTermination()
    spark.read.parquet(targetPath)
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    f.delete()
  }
}

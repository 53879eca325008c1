package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Model-gated ingest filtering — the streaming serving shape of the
  * hashed-feature quality classifier ([[graft.operators.TextAnalysis]]):
  * train ONCE offline on the static corpus, freeze the weight table into
  * the streaming plan as a constant, and score every arriving micro-batch
  * with a pure stateless projection, appending only the kept documents.
  * This is how a production corpus-quality filter actually deploys: the
  * model is versioned and frozen (scoring must be reproducible per model
  * generation — retraining inside the stream would make acceptance
  * drift with arrival order), and the filter itself is stateless, so
  * throughput is bounded by the scan, not by any state store.
  *
  * Scale: the frozen model is D longs folded into the plan (D = 1024
  * registered, 2^18 in production — a 2 MB literal), each micro-batch
  * plans scan → project → filter with zero exchanges and zero streaming
  * state; file-level exactly-once comes from the source's checkpoint
  * bookkeeping, which the two-drop harness exercises.
  */
object StreamModelFilter {

  /** `stream_model_filter_endstate`: two-drop end-to-end demo — the even
    * half of documents, then the odd half, each its own micro-batch
    * (`maxFilesPerTrigger=1`) in one AvailableNow run on one checkpoint.
    * The appended end state must equal the BATCH classifier score of the
    * full corpus restricted to kept rows — which is the DuckDB oracle
    * (same fixed-point arithmetic, so the match is bit-exact).
    */
  def streamModelFilterEndstate(spark: SparkSession, sfDir: String,
      restartPerDrop: Boolean = false): DataFrame = {
    import graft.sources.Tables
    import StreamHarness.land
    val documents = Tables.documents(spark, sfDir)
    // offline training pass: the weight table + threshold freeze here,
    // BEFORE the stream starts — drops never touch the model
    val scorer = graft.operators.TextAnalysis.qualityClassifierScorer(documents)
    val scratch = StreamHarness.freshScratch("stream_model_filter", sfDir)
    val srcDir = s"$scratch/drops"
    val outDir = s"$scratch/out"
    val ckpt = s"$scratch/ckpt"
    new java.io.File(srcDir).mkdirs()

    def runOnce(): Unit = {
      val q = scorer(
        spark.readStream.schema(documents.schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir))
        .where(col("kept"))
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .format("parquet")
        .option("path", outDir)
        .start()
      q.awaitTermination()
    }

    StreamHarness.withDemoStreamConfs(spark) {
      if (restartPerDrop) {
        land(documents.where(pmod(col("doc_id"), lit(2)) === 0), scratch, srcDir,
          "drop1", order = 0)
        runOnce()
        // drop1.parquet is still in srcDir — run 2 must skip it via checkpoint
        land(documents.where(pmod(col("doc_id"), lit(2)) === 1), scratch, srcDir,
          "drop2", order = 1)
        runOnce()
      } else {
        StreamHarness.landAll(
          () => land(documents.where(pmod(col("doc_id"), lit(2)) === 0), scratch, srcDir,
            "drop1", order = 0),
          () => land(documents.where(pmod(col("doc_id"), lit(2)) === 1), scratch, srcDir,
            "drop2", order = 1))
        runOnce()
      }
    }

    spark.read.parquet(outDir)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("score_ppm"),
        col("threshold_ppm"), col("kept"), col("is_holdout"))
  }

  val oracles: Map[String, String] = Map(
    // the end state must equal the batch score of the whole corpus
    // restricted to kept rows — the stream's two drops cover the corpus
    // exactly once, and the frozen model makes scoring order-independent
    "stream_model_filter_endstate" ->
      s"""WITH ${graft.operators.TextAnalysis.clfScoredCtes}
         |SELECT doc_id, lang, n_tokens, score_ppm, threshold_ppm, kept,
         |       is_holdout
         |FROM clf_scored WHERE kept""".stripMargin
  )
}

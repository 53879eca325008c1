package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.sources.Tables

/** Failure recovery for the loop-shaped operators (docs/DEPLOY.md §2): the
  * iterative operators truncate lineage every round (Iterate.materialize),
  * which makes the truncation backend the fault-tolerance decision —
  * localCheckpoint blocks die with their executor and are irrecoverable
  * (lineage is gone), reliable checkpoint files survive executor loss.
  *
  * local[*] cannot kill an executor without killing the JVM, but the
  * FAILURE MODE executor loss induces — the iterate's materialized blocks
  * vanish from executor storage while a downstream job still needs them —
  * is simulated exactly: wipe every persisted block between the loop's
  * materialization and the consuming action. Under reliable checkpointing
  * the wipe must be survivable (state is files, not blocks) with
  * bit-identical output; under the default localCheckpoint the same wipe
  * must fail with the documented checkpoint-block error, pinning WHY
  * DEPLOY.md prescribes the reliable knob on clusters.
  */
class CheckpointRecoverySpec extends SparkTestBase {

  /** Simulate losing every executor's block store: drop all persisted
    * blocks (cached frames recompute from lineage; localCheckpoint blocks
    * are unrecoverable by construction).
    */
  private def wipeExecutorStorage(): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    ()
  }

  private def withReliable[T](body: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    try body(dir)
    finally spark.conf.unset("spark.graft.checkpoint.reliable")
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  test("dedup_clusters survives executor-storage loss under reliable checkpointing, bit-identically") {
    val docs = Tables.documents(spark, sf)
    val clean = rows(Dedup.dedupClusters(docs))
    spark.catalog.clearCache()
    val recovered = withReliable { dir =>
      val out = Dedup.dedupClusters(docs)
      // the loop has materialized its final iterate; now every executor
      // block vanishes before the caller's first action
      wipeExecutorStorage()
      val r = rows(out)
      // the iterate really is file-backed: checkpoint files were written
      val files = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      assert(files.nonEmpty, s"no checkpoint files under $dir")
      r
    }
    assert(recovered == clean,
      "reliable-checkpoint run after storage loss must equal the clean run")
  }

  test("the same storage loss is irrecoverable under localCheckpoint (the documented cluster failure)") {
    val out = Dedup.dedupClusters(Tables.documents(spark, sf))
    wipeExecutorStorage()
    val e = intercept[Exception](out.collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("Checkpoint block")),
      s"expected the checkpoint-block failure, got: ${messages(e).mkString(" | ")}")
  }

  test("graph_centrality's periodic iterate recovers identically past the checkpoint period") {
    // iters = 9 crosses GraphCheckpointEvery (8), so a mid-loop truncation
    // exists and the final round's plan reads it
    val emb = Tables.embeddings(spark, sf)
    val clean = rows(Similarity.graphCentrality(emb, iters = 9))
    spark.catalog.clearCache()
    val recovered = withReliable { _ =>
      val out = Similarity.graphCentrality(emb, iters = 9)
      wipeExecutorStorage()
      rows(out)
    }
    assert(recovered == clean,
      "reliable-checkpoint centrality after storage loss must equal the clean run")
  }

  test("BPE training is backend-invariant: reliable checkpointing yields the identical merge table") {
    val docs = Tables.documents(spark, sf)
    val clean = rows(TextAnalysis.bpeTrainMerges(docs))
    spark.catalog.clearCache()
    val reliable = withReliable(_ => rows(TextAnalysis.bpeTrainMerges(docs)))
    assert(reliable == clean, "BPE merges must not depend on the checkpoint backend")
  }
}

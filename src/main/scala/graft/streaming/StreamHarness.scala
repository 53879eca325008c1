package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for the `stream_*_endstate` driver queries: a scratch
  * area per (query, sf-dir), single-file parquet drops into a watched source
  * directory, recursive delete. Pure driver-side file mechanics — the
  * streaming semantics live in the queries that use it.
  */
private[streaming] object StreamHarness {

  /** Fresh (emptied) scratch root for one endstate query at one sf dir.
    * Rooted via [[graft.Scratch]] (conf / spark.local.dir / tmpdir) instead
    * of a CWD-relative literal, so the jar runs from any directory.
    */
  def freshScratch(prefix: String, sfDir: String): String = {
    val scratch = graft.Scratch.dir(SparkSession.active,
      s"$prefix/" + sfDir.replaceAll("[^a-zA-Z0-9]", "_"))
    delete(new java.io.File(scratch))
    scratch
  }

  /** Land `df` as a single parquet file named `name.parquet` in `srcDir`
    * (the file source lists *.parquet at the root).
    *
    * `order` >= 0 pins the landed file's modification time to a strictly
    * increasing per-order value: the file source sorts pending files by
    * mtime (oldest first), so when several drops are landed BEFORE one
    * `maxFilesPerTrigger=1` AvailableNow run — the single-lifecycle
    * endstate form — drop k is guaranteed to be micro-batch k. Without the
    * pin the ordering rests on the staging writes' natural ms-granularity
    * timestamps, which is near-certain but not a contract.
    */
  def land(df: DataFrame, scratch: String, srcDir: String, name: String,
      order: Int = -1): Unit = {
    val t0 = System.nanoTime()
    landInner(df, scratch, srcDir, name, order)
    if (sys.env.contains("GRAFT_STREAM_DEBUG"))
      System.err.println(f"[stream] land $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  private def landInner(df: DataFrame, scratch: String, srcDir: String,
      name: String, order: Int): Unit = {
    val tmp = s"$scratch/stage_$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file in $tmp"))
    val dest = new java.io.File(s"$srcDir/$name.parquet")
    java.nio.file.Files.move(part.toPath, dest.toPath)
    // strictly past timestamps (the source must not see a file from the
    // future), 60 s apart: the spacing dominates both coarse-mtime
    // filesystems and the wall-clock drift between successive land() calls
    // (each call re-reads the clock), so order k is always older than k+1
    if (order >= 0)
      dest.setLastModified(System.currentTimeMillis() - 86400000L + order * 60000L): Unit
    delete(new java.io.File(tmp))
  }

  /** Run independent [[land]] drops concurrently (r17, guide §2.6 applied
    * to the driver): each land is a single-task write job plus a commit
    * protocol, ~0.1–0.25 s of mostly driver latency, and a twin's drops are
    * landed back-to-back BEFORE one AvailableNow lifecycle — their order is
    * carried by the pinned mtimes, not by call sequence, so overlapping
    * them is semantics-free. Measured ~0.5–0.7 s of a 3.8 s twin spent in
    * serial lands (GRAFT_STREAM_DEBUG timer).
    *
    * Only for drops that are all computable up front: a twin that lands,
    * RUNS, then lands again (restart-per-drop form) stays sequential.
    */
  def landAll(lands: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(4, lands.size)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try Await.result(Future.sequence(lands.map(f => Future(f())).toSeq), Duration.Inf): Unit
    finally pool.shutdown()
  }

  def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    f.delete()
  }

  /** Scope the demo-sized streaming confs around `body`, restoring previous
    * values after. Two knobs, both pure per-micro-batch lifecycle overhead
    * at demo scale (the data itself is tiny):
    *
    *  - `spark.sql.shuffle.partitions` → `parts`: every state partition pays
    *    store open/commit/snapshot file I/O per micro-batch, so 32 session
    *    partitions mean 64 store commits for two runs of ~20k rows (~4 s of
    *    pure overhead measured); a production deployment sizes this to the
    *    real drop volume instead. parts=4 is the measured local sweet spot
    *    (sessionize endstate lifecycle at sf0.1: 2.13 s at 1, 2.36 s at 2,
    *    1.85 s at 4, 1.90 s at 8 — the data batch wants parallelism, the
    *    near-empty batches want few stores). The FIRST run freezes the
    *    count into the checkpoint, so it must be set before the first run
    *    of a given checkpoint.
    *  - `spark.sql.streaming.checkpoint.fileChecksum.enabled` → false: the
    *    Spark 4 checksum file manager writes a sidecar checksum per
    *    checkpoint file (offsets/commits/state deltas — a dozen small fsyncs
    *    per batch here). Real deployments keep it for corruption detection
    *    on remote checkpoints; for a local demo checkpoint it is pure
    *    per-batch latency.
    */
  def withDemoStreamConfs[T](spark: SparkSession, parts: Int = 4)(body: => T): T = {
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val checksumKey = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    val prevChecksum = spark.conf.getOption(checksumKey)
    // NOTE (r17): disabling the engine's implicit no-data micro-batches
    // (spark.sql.streaming.noDataMicroBatches.enabled=false) was tried for
    // the lane's fixed cost and REVERTED: the windowed-aggregate twins
    // rely on the final no-data batch to evaluate the last data batch's
    // watermark (stream_late_data_endstate dropped 150 → 140 rows — the
    // last window never flushed). The sentinel discipline covers
    // mid-stream flushes, not the final one.
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    spark.conf.set(checksumKey, "false")
    try body
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prevChecksum match {
        case Some(v) => spark.conf.set(checksumKey, v)
        case None => spark.conf.unset(checksumKey)
      }
    }
  }
}

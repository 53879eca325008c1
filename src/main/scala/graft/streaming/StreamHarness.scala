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
    */
  def land(df: DataFrame, scratch: String, srcDir: String, name: String): Unit = {
    val tmp = s"$scratch/stage_$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file in $tmp"))
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$srcDir/$name.parquet"))
    delete(new java.io.File(tmp))
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
    *    real drop volume instead. The FIRST run freezes the count into the
    *    checkpoint, so it must be set before the first run of a given
    *    checkpoint.
    *  - `spark.sql.streaming.checkpoint.fileChecksum.enabled` → false: the
    *    Spark 4 checksum file manager writes a sidecar checksum per
    *    checkpoint file (offsets/commits/state deltas — a dozen small fsyncs
    *    per batch here). Real deployments keep it for corruption detection
    *    on remote checkpoints; for a local demo checkpoint it is pure
    *    per-batch latency.
    */
  def withDemoStreamConfs[T](spark: SparkSession, parts: Int = 2)(body: => T): T = {
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val checksumKey = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    val prevChecksum = spark.conf.getOption(checksumKey)
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

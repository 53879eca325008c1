package graft.streaming

import org.apache.spark.sql.DataFrame

/** Shared plumbing for the `stream_*_endstate` driver queries: a scratch
  * area per (query, sf-dir), single-file parquet drops into a watched source
  * directory, recursive delete. Pure driver-side file mechanics — the
  * streaming semantics live in the queries that use it.
  */
private[streaming] object StreamHarness {

  /** Fresh (emptied) scratch root for one endstate query at one sf dir. */
  def freshScratch(prefix: String, sfDir: String): String = {
    val scratch = s"target/$prefix/" + sfDir.replaceAll("[^a-zA-Z0-9]", "_")
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
}

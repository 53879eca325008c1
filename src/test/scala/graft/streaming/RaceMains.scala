package graft.streaming

import org.apache.spark.sql.SparkSession

/** Forked-JVM entry points for the CROSS-PROCESS manifest race spec.
  *
  * The in-JVM racing specs (StreamingSpec "manifest racing committers…")
  * race threads; real committers race from separate processes with nothing
  * shared but the store. These mains are launched by
  * `StreamingSpec."cross-process manifest race…"` as real `java` child
  * processes:
  *
  *  - [[RaceSyncMain]] runs the FULL [[IncrementalSync.syncOnceManifest]]
  *    (its own SparkSession, its own source drop and checkpoint) against a
  *    shared `graftobj://` table. A commit barrier
  *    (`graft.manifest.commit.barrier`, see [[ManifestStore.commit]]) holds
  *    every committer between manifest-write and publish until the spec
  *    releases it, so both processes provably reach the conditional PUT
  *    targeting the SAME version. Exit codes: 0 = committed,
  *    17 = lost the race ([[ManifestStore.ConcurrentCommitException]]),
  *    1 = anything else.
  *  - [[RaceReadMain]] is the third process: a plain JVM (no Spark) that
  *    resolves the table tip through the object store and prints
  *    `version=… buckets=… files=… bytes=…` for the spec to parse.
  */
object RaceSyncMain {
  def main(args: Array[String]): Unit = {
    val Array(objRoot, tableRoot, srcDir, ckpt, barrierDir) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-race-committer")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.hadoop.fs.graftobj.impl", classOf[ObjectStoreFileSystem].getName)
      .config("spark.hadoop.fs.graftobj.root.dir", objRoot)
      .config("spark.hadoop.fs.graftobj.impl.disable.cache", "true")
      .config("spark.hadoop.graft.manifest.commit.barrier", barrierDir)
      .getOrCreate()
    try {
      val schema = spark.read.parquet(srcDir).schema
      IncrementalSync.syncOnceManifest(
        spark, schema, srcDir, tableRoot, ckpt, "id", "ts", nBuckets = 4)
      System.exit(0)
    } catch {
      case t: Throwable =>
        val lost = Iterator.iterate[Throwable](t)(_.getCause).takeWhile(_ != null)
          .exists(_.isInstanceOf[ManifestStore.ConcurrentCommitException])
        if (!lost) t.printStackTrace()
        System.exit(if (lost) 17 else 1)
    } finally spark.stop()
  }
}

/** Third-process reader: resolve the tip via [[ManifestStore.readLatest]]
  * and list its data files through the object-store FS — no Spark, nothing
  * shared with the committers but the store itself.
  */
object RaceReadMain {
  def main(args: Array[String]): Unit = {
    val Array(objRoot, tableRoot) = args
    val conf = ObjectStoreFileSystem.configured(objRoot)
    val tip = ManifestStore.readLatest(tableRoot, conf).getOrElse {
      System.err.println(s"no manifest under $tableRoot"); sys.exit(2)
    }
    val fs = new org.apache.hadoop.fs.Path(tableRoot).getFileSystem(conf)
    val files = tip.allPaths(tableRoot).flatMap { dir =>
      fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    }
    println(s"version=${tip.version} buckets=${tip.buckets.size} " +
      s"files=${files.size} bytes=${files.map(_.getLen).sum}")
    System.exit(0)
  }
}

package graft.streaming

import java.nio.charset.StandardCharsets

import scala.collection.immutable.SortedMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Manifest-pointer commit protocol for a hash-bucketed table on storage
  * WITHOUT atomic directory rename — the object-store commit the rename-based
  * `IncrementalSync.swapBuckets` cannot provide (its scaladoc points here).
  *
  * Layout under the table root:
  * {{{
  *   data/<commitId>/__bucket=<p>/part-….parquet   immutable once written
  *   manifests/manifest-<v>                        immutable, version-numbered
  * }}}
  *
  * A manifest maps every bucket to the data directory holding its CURRENT
  * contents. Readers resolve the table by listing `manifests/` and taking
  * the highest version — the same discovery shape as a Delta/Iceberg log.
  * A commit (1) writes new data files under a fresh `commitId` (PUTs of new
  * objects — no rename, no overwrite, no delete), then (2) writes
  * `manifest-<v+1>` carrying the previous manifest's entries for untouched
  * buckets and the new directories for touched ones. Step 2 is the commit
  * point: a single small object becoming visible. On an object store a PUT
  * is atomic per object (the manifest is never visible half-written; s3a/gs
  * create+close publishes only complete objects); on local/HDFS the same
  * guarantee is reproduced by write-temp-then-rename of the one small file.
  * A crash ANYWHERE before step 2 leaves only unreferenced data files —
  * readers keep resolving the previous version; nothing is ever
  * old-AND-new-mixed within a version. Unreferenced files from crashed
  * commits are reclaimed by [[vacuum]], which is pure garbage collection —
  * never part of commit correctness.
  *
  * Single-writer contract (the streaming query IS the single writer): two
  * concurrent committers could both write `manifest-<v+1>`; guarding that
  * needs a conditional PUT / rename-if-absent, which stores expose in
  * store-specific ways. Matches the reference's model of one cron sync per
  * table (CLAUDE.md:66-68).
  */
object ManifestStore {

  final case class Manifest(version: Long, buckets: SortedMap[Int, String]) {
    /** Absolute data paths for `touched` buckets present in the table. */
    def bucketPaths(root: String, touched: Seq[Int]): Seq[String] =
      touched.flatMap(buckets.get).map(rel => s"$root/$rel")
    def allPaths(root: String): Seq[String] =
      buckets.values.toSeq.map(rel => s"$root/$rel")
  }

  private def fs(root: String, conf: Configuration): FileSystem =
    new Path(root).getFileSystem(conf)

  private def manifestDir(root: String) = new Path(root, "manifests")

  private val ManifestName = raw"manifest-(\d+)".r

  /** Highest-version manifest, or None for a table that has never committed.
    * (Versions are contiguous under the single-writer contract; max is the
    * tip.)
    */
  def readLatest(root: String, conf: Configuration): Option[Manifest] = {
    val f = fs(root, conf)
    val dir = manifestDir(root)
    if (!f.exists(dir)) return None
    val versions = f.listStatus(dir).iterator.flatMap { st =>
      st.getPath.getName match {
        case ManifestName(v) => Some(v.toLong)
        case _ => None // in-flight temp or foreign file: not a version
      }
    }.toSeq
    if (versions.isEmpty) None
    else Some(read(root, versions.max, conf))
  }

  /** Resolve the table AT a specific committed version — manifests are
    * immutable, so any version's file list stays readable until [[vacuum]]
    * reclaims its superseded data dirs (the retention window is the
    * operator's vacuum cadence, the standard time-travel contract).
    */
  def readVersion(root: String, version: Long, conf: Configuration): Manifest =
    read(root, version, conf)

  private def read(root: String, version: Long, conf: Configuration): Manifest = {
    val f = fs(root, conf)
    val in = f.open(new Path(manifestDir(root), s"manifest-$version"))
    val text =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        StandardCharsets.UTF_8)
      finally in.close()
    // line format (no JSON parser dependency): "version=N" then "p<TAB>relpath"
    val lines = text.split('\n').iterator.map(_.trim).filter(_.nonEmpty).toSeq
    require(lines.head == s"version=$version",
      s"manifest-$version header mismatch: '${lines.head}'")
    val buckets = lines.tail.map { l =>
      val Array(p, rel) = l.split('\t')
      p.toInt -> rel
    }
    Manifest(version, SortedMap(buckets: _*))
  }

  /** Commit: publish `manifest-<base.version + 1>` = base's entries with
    * `newDirs` (bucket → table-relative data dir) layered on top. The new
    * data must already be fully written. Returns the committed manifest.
    */
  def commit(
      root: String,
      newDirs: Map[Int, String],
      base: Option[Manifest],
      conf: Configuration): Manifest = {
    val version = base.map(_.version + 1).getOrElse(0L)
    val merged = base.map(_.buckets).getOrElse(SortedMap.empty[Int, String]) ++ newDirs
    val body = (s"version=$version" +:
      merged.toSeq.map { case (p, rel) => s"$p\t$rel" }).mkString("", "\n", "\n")
    val f = fs(root, conf)
    val dir = manifestDir(root)
    f.mkdirs(dir)
    // publish as one small object: write under a temp name, rename to the
    // final version name. On local/HDFS the rename is atomic; on an object
    // store the "rename" materializes as a full-object PUT at the final
    // name (atomic visibility per object) + delete of the temp — readers
    // can never observe a partial manifest either way. Direct create at
    // the final name would be fine on S3 but could expose a half-written
    // file on POSIX.
    val tmp = new Path(dir, s".manifest-$version.inprogress")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (!f.rename(tmp, new Path(dir, s"manifest-$version")))
      throw new java.io.IOException(s"manifest commit rename failed for v$version")
    Manifest(version, merged)
  }

  /** Fresh table-relative data directory for one commit's files. */
  def newCommitDir(): String = s"data/${java.util.UUID.randomUUID().toString.take(12)}"

  /** Garbage-collect data directories no longer referenced by the LATEST
    * manifest (crashed commits, superseded bucket versions) and superseded
    * manifest files. Pure cleanup — correctness never depends on it; unsafe
    * only for readers pinned to old versions (time travel), which this
    * store does not offer.
    */
  def vacuum(root: String, conf: Configuration): Unit = {
    val f = fs(root, conf)
    readLatest(root, conf).foreach { m =>
      val referenced = m.buckets.values.map(rel => rel.split('/')(1)).toSet
      val dataDir = new Path(root, "data")
      if (f.exists(dataDir)) f.listStatus(dataDir).foreach { st =>
        if (!referenced.contains(st.getPath.getName)) f.delete(st.getPath, true)
      }
      val mDir = manifestDir(root)
      f.listStatus(mDir).foreach { st =>
        st.getPath.getName match {
          case ManifestName(v) if v.toLong < m.version => f.delete(st.getPath, false)
          case _ => ()
        }
      }
    }
  }
}

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
  * Writer concurrency: the commit point is "make `manifest-<v+1>` visible
  * IFF it does not already exist". That one primitive is store-specific —
  * S3 conditional PUT (If-None-Match), GCS `ifGenerationMatch(0)`, HDFS
  * no-overwrite rename — so it is INJECTABLE via [[CommitIfAbsent]], and
  * the default ([[AutoIfAbsent]]) resolves the right primitive from the
  * table root's scheme: conditional PUT on object stores, hard-link
  * create on POSIX `file:` roots, no-overwrite rename on HDFS. A racing
  * loser gets [[ConcurrentCommitException]] —
  * its data files stay unreferenced (vacuum food) and it retries against
  * the new tip. [[LocalLinkIfAbsent]] is the POSIX-atomic variant
  * (hard-link create) the racing-committers property spec uses;
  * [[CreateIfAbsent]] is the object-store variant (create-no-overwrite →
  * S3 conditional PUT / GCS ifGenerationMatch(0)), spec-covered by a
  * fault-injecting FileSystem that loses the conditional PUT.
  */
object ManifestStore {

  /** Store-specific atomic publish: make `tmp`'s bytes visible at `dest`
    * iff nothing exists at `dest`. Returns false when a racing committer
    * already published `dest` (the caller's commit loses).
    */
  trait CommitIfAbsent {
    def apply(f: FileSystem, tmp: Path, dest: Path): Boolean
  }

  /** Default publish: exists-check then rename. Atomic on HDFS (rename
    * refuses an existing destination); raw-local and object-store renames
    * can overwrite, leaving a TOCTOU window — fine under the single-writer
    * deployment, inject a real conditional PUT otherwise.
    */
  object RenameIfAbsent extends CommitIfAbsent {
    def apply(f: FileSystem, tmp: Path, dest: Path): Boolean =
      if (f.exists(dest)) false
      else if (f.rename(tmp, dest)) true
      else throw new java.io.IOException(s"manifest publish rename failed: $dest")
  }

  /** Object-store publish: stream the temp's bytes into
    * `create(dest, overwrite = false)` and close — the close IS the
    * conditional PUT. On s3a with conditional create enabled (hadoop-aws ≥
    * 3.4.1, `fs.s3a.create.conditional.enabled`, default on) the object is
    * materialized with `If-None-Match: *`, so the store — not a
    * check-then-act race — rejects the slower committer; the GCS connector's
    * `create(overwrite = false)` carries the equivalent
    * `ifGenerationMatch(0)` precondition. Either way the loser surfaces as
    * an absence-conflict IOException (at create OR at close, depending on
    * where the store evaluates the precondition) and this publish returns
    * false → [[ConcurrentCommitException]] upstream, with the winner's
    * manifest untouched.
    *
    * NOT for POSIX roots: a local `create(false)` is a TOCTOU exists-check
    * and exposes the file while it is still being written — use
    * [[LocalLinkIfAbsent]] there (hard-link create, same contract). On a
    * store where close() publishes complete objects atomically, the
    * mid-write visibility problem does not exist.
    */
  object CreateIfAbsent extends CommitIfAbsent {
    def apply(f: FileSystem, tmp: Path, dest: Path): Boolean = {
      // conflict can surface at create (store evaluates eagerly, or a
      // local FilterFileSystem test double) or at close (S3 evaluates the
      // If-None-Match on the final PUT)
      def conflict(e: java.io.IOException): Boolean =
        e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] ||
          e.getClass.getSimpleName == "RemoteFileChangedException" ||
          Option(e.getMessage).exists(_.toLowerCase.contains("already exists"))
      try {
        val out = f.create(dest, false)
        val in = f.open(tmp)
        try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
        finally in.close()
        out.close()
        true
      } catch {
        case e: java.io.IOException if conflict(e) => false
      } finally f.delete(tmp, false)
    }
  }

  /** POSIX-atomic publish for `file:` roots: hard-link create fails iff the
    * destination exists — a true conditional PUT on a local filesystem.
    */
  object LocalLinkIfAbsent extends CommitIfAbsent {
    def apply(f: FileSystem, tmp: Path, dest: Path): Boolean = {
      val tmpFile = java.nio.file.Paths.get(f.makeQualified(tmp).toUri)
      val destFile = java.nio.file.Paths.get(f.makeQualified(dest).toUri)
      try {
        java.nio.file.Files.createLink(destFile, tmpFile)
        f.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    }
  }

  /** Scheme-dispatched publish: the conditional-PUT primitive is a property
    * of the STORE, not a per-caller choice, so the default resolves it from
    * the filesystem's scheme — object stores get [[CreateIfAbsent]] (the
    * store's own If-None-Match / ifGenerationMatch(0)), POSIX `file:` roots
    * get [[LocalLinkIfAbsent]] (hard-link create, atomic across processes),
    * HDFS keeps [[RenameIfAbsent]] (its rename refuses an existing
    * destination atomically). Callers with a store this table doesn't know
    * still inject their own primitive explicitly.
    */
  object AutoIfAbsent extends CommitIfAbsent {
    private[graft] def forScheme(scheme: String): CommitIfAbsent =
      scheme match {
        case "graftobj" | "s3a" | "s3" | "gs" | "abfs" | "abfss" | "oss" |
             "wasb" | "wasbs" | "cos" => CreateIfAbsent
        case "file" | null | "" => LocalLinkIfAbsent
        case _ => RenameIfAbsent // hdfs, viewfs, o3fs: atomic no-overwrite rename
      }
    def apply(f: FileSystem, tmp: Path, dest: Path): Boolean =
      forScheme(f.getUri.getScheme)(f, tmp, dest)
  }

  /** A racing committer already published this version; retry against the
    * new tip (the lost commit's data files are unreferenced — vacuum food).
    */
  final class ConcurrentCommitException(version: Long)
    extends java.io.IOException(
      s"manifest-$version already committed by a concurrent writer; " +
        "re-read the tip and retry")

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
    * reclaims it: vacuum keeps the newest `keepVersions` manifests (and
    * every data dir any of them references), so time travel is valid for
    * exactly that window × the operator's vacuum cadence — the standard
    * retention contract.
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
      conf: Configuration,
      publish: CommitIfAbsent = AutoIfAbsent): Manifest = {
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
    // unique temp per committer so racing writers never clobber each
    // other's in-flight bytes before the publish step decides the winner
    val tmp = new Path(dir,
      s".manifest-$version.${java.util.UUID.randomUUID().toString.take(8)}.inprogress")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    // fault-injection barrier for the racing-committer specs: when
    // `graft.manifest.commit.barrier` names a directory, every committer
    // announces readiness there and holds between tmp-write and publish
    // until `<dir>/go` appears — so independent PROCESSES provably reach
    // the conditional PUT with the same target version. Never set outside
    // tests; absent ⇒ zero-cost no-op.
    Option(conf.get("graft.manifest.commit.barrier")).foreach { b =>
      val barrier = new java.io.File(b)
      barrier.mkdirs()
      val ready = new java.io.File(barrier,
        s"ready-${java.util.UUID.randomUUID().toString.take(8)}")
      ready.createNewFile()
      val go = new java.io.File(barrier, "go")
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (!go.exists() && System.nanoTime() < deadline) Thread.sleep(10)
      require(go.exists(), s"commit barrier $b never released")
    }
    if (!publish(f, tmp, new Path(dir, s"manifest-$version"))) {
      f.delete(tmp, false)
      throw new ConcurrentCommitException(version)
    }
    Manifest(version, merged)
  }

  /** Fresh table-relative data directory for one commit's files. */
  def newCommitDir(): String = s"data/${java.util.UUID.randomUUID().toString.take(12)}"

  /** Garbage-collect everything outside the retention window: keep the
    * newest `keepVersions` manifests and every data directory ANY retained
    * manifest references; delete the rest (crashed commits' orphans,
    * superseded bucket versions, older manifests). Pure cleanup —
    * correctness never depends on it. The retention window IS the
    * time-travel contract: [[readVersion]] serves any version whose
    * manifest a vacuum has not yet dropped, so `keepVersions` × the vacuum
    * cadence bounds how far back readers can pin.
    */
  def vacuum(root: String, conf: Configuration, keepVersions: Int = 1): Unit = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val f = fs(root, conf)
    readLatest(root, conf).foreach { m =>
      val keepFrom = m.version - (keepVersions - 1)
      // versions inside the window may already be gone (a previous vacuum
      // with a smaller window) — retain whatever still resolves
      val retained = (keepFrom.max(0L) to m.version).flatMap(v =>
        scala.util.Try(read(root, v, conf)).toOption)
      val referenced = retained
        .flatMap(_.buckets.values.map(rel => rel.split('/')(1))).toSet
      val dataDir = new Path(root, "data")
      if (f.exists(dataDir)) f.listStatus(dataDir).foreach { st =>
        if (!referenced.contains(st.getPath.getName)) f.delete(st.getPath, true)
      }
      val mDir = manifestDir(root)
      f.listStatus(mDir).foreach { st =>
        st.getPath.getName match {
          case ManifestName(v) if v.toLong < keepFrom => f.delete(st.getPath, false)
          case _ => ()
        }
      }
    }
  }
}

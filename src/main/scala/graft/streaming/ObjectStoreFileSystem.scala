package graft.streaming

import java.io.{File, FileNotFoundException}
import java.net.URI
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A Hadoop `FileSystem` with OBJECT-STORE semantics (`graftobj://` URIs),
  * backed by a local directory — the store the ManifestStore commit
  * protocol is designed for, as a real registered filesystem rather than a
  * per-spec test double. (hadoop-aws / a live minio are not available in
  * this environment; this implements the same contract surface s3a
  * provides, so the CreateIfAbsent specs and the cross-process race run
  * against a store whose PUT-if-absent is the store's own primitive.)
  *
  * Semantics implemented (and deliberately NOT the local-FS ones):
  *  - **Writes are invisible until close.** `create()` buffers to a hidden
  *    temp object; `close()` is the PUT that makes the complete object
  *    visible in one step. A reader can never observe a half-written
  *    object (S3/GCS visibility model).
  *  - **`create(overwrite = false)` is a CONDITIONAL PUT evaluated by the
  *    store at PUT time (close), not a client exists-check at create time.**
  *    The publish step is an atomic hard-link of the temp to the final name
  *    — `link(2)` fails with EEXIST atomically even across PROCESSES, which
  *    is exactly the If-None-Match / ifGenerationMatch(0) contract. The
  *    loser's close() throws [[FileAlreadyExistsException]], which
  *    [[ManifestStore.CreateIfAbsent]] maps to a lost commit.
  *  - **No ATOMIC rename.** `rename` is emulated as copy-then-delete —
  *    exactly what s3a/gs connectors do — so Hadoop output committers can
  *    write parquet through this FS, but the emulation is observable
  *    mid-copy and O(bytes), never a commit primitive (the exact trap
  *    `IncrementalSync.assertRenameCapable` exists to catch: it refuses
  *    this scheme for the rename-swap protocol, and
  *    [[ManifestStore.AutoIfAbsent]] selects the conditional PUT here
  *    instead of [[ManifestStore.RenameIfAbsent]]).
  *  - Directories are virtual: `mkdirs` is a no-op success, a "directory"
  *    exists iff an object exists under its prefix (modelled on the local
  *    backing tree for listing simplicity).
  *
  * Configure with `fs.graftobj.impl` →
  * `graft.streaming.ObjectStoreFileSystem` and `fs.graftobj.root.dir` →
  * the local directory standing in for the bucket namespace.
  */
final class ObjectStoreFileSystem extends FileSystem {

  private var fsUri: URI = _
  private var rootDir: String = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = URI.create(s"${name.getScheme}://${Option(name.getAuthority).getOrElse("store")}")
    rootDir = conf.get("fs.graftobj.root.dir",
      System.getProperty("java.io.tmpdir") + "/graftobj")
    new File(rootDir).mkdirs()
  }

  override def getScheme: String = "graftobj"
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = new Path(fsUri.toString, "/")
  override def setWorkingDirectory(dir: Path): Unit = ()

  /** bucket-relative key → backing local file */
  private def local(p: Path): File = {
    val key = p.toUri.getPath.stripPrefix("/")
    new File(rootDir, if (key.isEmpty) "." else key)
  }

  private def status(f: File, p: Path): FileStatus =
    new FileStatus(if (f.isFile) f.length() else 0L, f.isDirectory, 1,
      64L << 20, f.lastModified(), makeQualified(p))

  override def getFileStatus(p: Path): FileStatus = {
    val f = local(p)
    if (!f.exists()) throw new FileNotFoundException(p.toString)
    status(f, p)
  }

  override def listStatus(p: Path): Array[FileStatus] = {
    val f = local(p)
    if (!f.exists()) throw new FileNotFoundException(p.toString)
    if (f.isFile) Array(status(f, p))
    else Option(f.listFiles()).getOrElse(Array.empty)
      // in-flight PUT temps are store-internal, never listed
      .filterNot(_.getName.startsWith(".graftobj-put-"))
      .map(c => status(c, new Path(p, c.getName)))
  }

  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    val f = local(p)
    if (!f.isFile) throw new FileNotFoundException(p.toString)
    new FSDataInputStream(new BufferedFSInputStream(new LocalRawInput(f), bufferSize))
  }

  /** Raw seekable input over the backing file. */
  private final class LocalRawInput(f: File) extends FSInputStream {
    private val ch = java.nio.channels.FileChannel.open(f.toPath)
    override def seek(pos: Long): Unit = { ch.position(pos); () }
    override def getPos: Long = ch.position()
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(): Int = {
      val b = java.nio.ByteBuffer.allocate(1)
      if (ch.read(b) <= 0) -1 else b.get(0) & 0xff
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      ch.read(java.nio.ByteBuffer.wrap(b, off, len))
    override def close(): Unit = ch.close()
  }

  override def create(p: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val dest = local(p)
    Option(dest.getParentFile).foreach(_.mkdirs())
    val tmp = new File(dest.getParentFile,
      s".graftobj-put-${java.util.UUID.randomUUID().toString.take(12)}")
    // Buffered: FilterOutputStream's inherited write(byte[],off,len) would
    // otherwise degrade every multi-byte write into per-byte syscalls
    val out = new java.io.BufferedOutputStream(
      Files.newOutputStream(tmp.toPath), math.max(bufferSize, 64 << 10))
    val publishOnClose = new java.io.FilterOutputStream(out) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len)
      override def close(): Unit = {
        super.close()
        try {
          if (overwrite)
            Files.move(tmp.toPath, dest.toPath, StandardCopyOption.REPLACE_EXISTING,
              StandardCopyOption.ATOMIC_MOVE)
          else
            try Files.createLink(dest.toPath, tmp.toPath)
            catch {
              case _: java.nio.file.FileAlreadyExistsException =>
                throw new FileAlreadyExistsException(
                  s"412 Precondition Failed (conditional PUT: object exists): $p")
            }
        } finally Files.deleteIfExists(tmp.toPath)
      }
    }
    new FSDataOutputStream(publishOnClose, null)
  }

  override def append(p: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("object stores do not append")

  /** Hadoop-contract rename, emulated as COPY + DELETE (the s3a model):
    * non-atomic, O(bytes), a reader can observe the partial copy. Good
    * enough for output committers; never a commit primitive.
    */
  override def rename(src: Path, dst: Path): Boolean = {
    val s = local(src)
    if (!s.exists()) return false
    val d0 = local(dst)
    // Hadoop semantics: renaming onto an existing directory moves src UNDER it
    val d = if (d0.isDirectory) new File(d0, s.getName) else d0
    if (d.exists()) return false
    if (!d.getParentFile.exists()) return false
    def copy(from: File, to: File): Unit =
      if (from.isDirectory) {
        to.mkdirs()
        Option(from.listFiles()).toSeq.flatten
          .foreach(c => copy(c, new File(to, c.getName)))
      } else {
        Files.copy(from.toPath, to.toPath, StandardCopyOption.COPY_ATTRIBUTES): Unit
      }
    copy(s, d)
    delete(src, recursive = true)
    true
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    val f = local(p)
    if (!f.exists()) false
    else if (f.isFile) f.delete()
    else {
      require(recursive || Option(f.listFiles()).forall(_.isEmpty),
        s"non-recursive delete of non-empty prefix $p")
      def rm(x: File): Unit = {
        if (x.isDirectory) Option(x.listFiles()).toSeq.flatten.foreach(rm)
        x.delete(): Unit
      }
      rm(f); true
    }
  }

  override def mkdirs(p: Path, permission: FsPermission): Boolean = {
    // virtual: objects create their prefixes on write; mirror on backing fs
    local(p).mkdirs(); true
  }
}

object ObjectStoreFileSystem {
  /** Configuration with the `graftobj` scheme registered over `rootDir`. */
  def configured(rootDir: String, base: Configuration = new Configuration()): Configuration = {
    val conf = new Configuration(base)
    conf.set("fs.graftobj.impl", classOf[ObjectStoreFileSystem].getName)
    conf.set("fs.graftobj.root.dir", rootDir)
    // one FileSystem instance per (scheme, conf) is cached JVM-wide; the
    // root dir is per-conf state, so disable the cache for this scheme
    conf.set("fs.graftobj.impl.disable.cache", "true")
    conf
  }
}

package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileContext, FileStatus, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Metadata I/O for the table formats ([[ManifestTable]], [[Versioned]],
  * [[graft.sources.v2.VersionedCatalog]]) on the Hadoop `FileSystem` API,
  * so a table root can live on anything Spark itself can reach — local
  * paths, `file://`, `hdfs://`, `s3a://` — the way the reference's
  * lakehouse lives on s3a MinIO
  * (`/root/reference/dags/2_bronze_to_silver.py:47-52`). Data files were
  * always read/written through Spark (Hadoop-aware); this moves the
  * METADATA plane (pointers, manifests, descriptors) onto the same stack.
  *
  * The two primitives with atomicity contracts:
  *
  *  - [[createNew]] — win-or-fail exclusive create (the commit CLAIM).
  *    Local paths go through POSIX `O_CREAT|O_EXCL` (truly atomic); HDFS
  *    `create(overwrite=false)` is namenode-exclusive (atomic); plain
  *    object stores degrade to check-then-create, where a real deployment
  *    supplies the store's conditional-PUT (If-None-Match) — the protocol
  *    needs exactly one win-or-fail primitive and maps onto whichever the
  *    store provides. Always signals a loss as Hadoop's
  *    [[FileAlreadyExistsException]], whatever the backend threw.
  *  - [[writeAtomic]] — single-key overwrite publish (the pointer FLIP):
  *    temp file + rename-with-overwrite via [[FileContext]] (atomic on
  *    POSIX and HDFS; single-key PUT on object stores).
  *
  * All calls are driver-side (metadata is never touched from executors).
  */
private[graft] object MetaIO {

  /** The session's Hadoop conf when one is live (picks up s3a credentials
    * etc.); a bare default otherwise (tests, tooling). */
  private def hadoopConf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def path(s: String): Path = new Path(s)

  /** Filesystem for a metadata path. Local paths use the RAW local
    * filesystem: the checksummed wrapper Hadoop returns by default keeps
    * `.crc` sidecars whose rename is a separate step from the data
    * file's — a concurrent pointer reader could see new content with the
    * old checksum (ChecksumException) or a delete-then-rename gap
    * (FileNotFound). Raw local = plain POSIX semantics: `rename(2)`
    * replaces the destination atomically and there are no sidecars. */
  private def fsOf(p: Path): FileSystem =
    p.getFileSystem(hadoopConf) match {
      case l: org.apache.hadoop.fs.LocalFileSystem => l.getRaw
      case other => other
    }

  private def isLocal(f: FileSystem): Boolean = {
    val scheme = Option(f.getUri.getScheme).getOrElse("file")
    scheme == "file"
  }

  def exists(s: String): Boolean = { val p = path(s); fsOf(p).exists(p) }

  def isDirectory(s: String): Boolean = {
    val p = path(s); val f = fsOf(p)
    f.exists(p) && f.getFileStatus(p).isDirectory
  }

  def mkdirs(s: String): Unit = { val p = path(s); fsOf(p).mkdirs(p); () }

  def readString(s: String): String = {
    val p = path(s)
    val in = fsOf(p).open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  /** The file's first `maxBytes` bytes as a string — for header-only
    * inspection of large metadata files (a manifest's leading `#`-prop
    * lines) without paying a full-listing read per probe. */
  def readPrefix(s: String, maxBytes: Int): String = {
    val p = path(s)
    val in = fsOf(p).open(p)
    try {
      val buf = in.readNBytes(maxBytes)
      new String(buf, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Plain overwrite write — for content nothing races on (use
    * [[writeAtomic]] for pointers, [[createNew]] for claims). */
  def write(s: String, body: String): Unit = {
    val p = path(s)
    val out = fsOf(p).create(p, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Exclusive create-new with content — throws Hadoop's
    * [[FileAlreadyExistsException]] when the path exists (one winner, every
    * loser detectable). See the class doc for per-store atomicity. */
  def createNew(s: String, body: String): Unit = {
    val p = path(s)
    val f = fsOf(p)
    if (isLocal(f)) {
      // Write the full body to a sibling temp, then publish it under the
      // claimed name with link(2) — atomic win-or-fail (EEXIST under a
      // same-instant race) AND fully-formed-or-absent: a concurrent
      // reader probing the claim's header stamps (ownerOf/headProp) must
      // never see a truncated line, which direct O_EXCL + write allowed
      // (a racer that misread a half-written '__ref' as foreign would
      // skip the claim, plan against a stale base, and bury the winner's
      // commit). rename(2) is no substitute: POSIX rename silently
      // REPLACES an existing destination.
      val lp = java.nio.file.Paths.get(p.toUri.getPath)
      Option(lp.getParent).foreach(java.nio.file.Files.createDirectories(_))
      val tmp = lp.resolveSibling(
        s".${lp.getFileName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      java.nio.file.Files.write(tmp, body.getBytes(StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE_NEW, java.nio.file.StandardOpenOption.WRITE)
      try java.nio.file.Files.createLink(lp, tmp)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new FileAlreadyExistsException(s)
      } finally {
        try java.nio.file.Files.deleteIfExists(tmp)
        catch { case _: Throwable => () }
      }
      ()
    } else {
      val out = f.create(p, false) // HDFS: namenode-exclusive; stores: conditional PUT
      try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    }
  }

  /** Atomic single-key publish: write a sibling temp file, rename over
    * the target with replace. Local paths go through the raw
    * filesystem's `rename` (POSIX `rename(2)` — atomic replace, see
    * [[fsOf]]); elsewhere [[FileContext]] with `Rename.OVERWRITE` (atomic
    * on HDFS; single-key PUT semantics on object stores).
    *
    * The temp name is per-call unique: concurrent writers to the same key
    * (two sessions tagging one table, say) each stage into their own temp
    * file, so neither can publish the other's half-written content or
    * race on a shared `.tmp` that vanished mid-rename. Last rename wins —
    * the same last-writer-wins the target key itself has. */
  def writeAtomic(s: String, body: String): Unit = {
    val p = path(s)
    val f = fsOf(p)
    val tmp = new Path(p.getParent,
      s".${p.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    write(tmp.toString, body)
    try {
      if (isLocal(f)) require(f.rename(tmp, p), s"atomic publish of $s failed")
      else FileContext.getFileContext(p.toUri, hadoopConf)
        .rename(tmp, p, Options.Rename.OVERWRITE)
    } catch {
      case t: Throwable => // never leave a stray temp behind a failed publish
        try f.delete(tmp, false) catch { case _: Throwable => () }
        throw t
    }
  }

  /** Move a file (no-replace destination: UUID-named pool files never
    * collide). On an object store this is the server-side copy the class
    * doc of [[ManifestTable]] accounts for. */
  def rename(src: String, dst: String): Unit = {
    val sp = path(src); val dp = path(dst)
    val f = fsOf(dp)
    Option(dp.getParent).foreach(f.mkdirs(_))
    require(f.rename(sp, dp), s"rename $src -> $dst failed")
  }

  def delete(s: String, recursive: Boolean = false): Unit = {
    val p = path(s); fsOf(p).delete(p, recursive); ()
  }

  /** Direct children (empty for a missing dir). */
  def listStatus(dir: String): Seq[FileStatus] = {
    val p = path(dir); val f = fsOf(p)
    if (!f.exists(p)) Nil else f.listStatus(p).toSeq
  }

  /** All regular files below `dir`, recursively (empty if missing). */
  def listFilesRec(dir: String): Seq[FileStatus] = {
    val p = path(dir); val f = fsOf(p)
    if (!f.exists(p)) Nil
    else {
      val it = f.listFiles(p, true)
      val out = ArrayBuffer.empty[FileStatus]
      while (it.hasNext) out += it.next()
      out.toSeq
    }
  }

  /** `child`'s path relative to `dir` (both resolved against the same
    * filesystem, so qualification matches). */
  def relativize(dir: String, child: Path): String = {
    val p = path(dir)
    val qual = fsOf(p).makeQualified(p).toString
    val c = child.toString
    require(c.startsWith(qual + "/"), s"$child is not under $dir")
    c.stripPrefix(qual + "/")
  }

  def size(s: String): Long = { val p = path(s); fsOf(p).getFileStatus(p).getLen }

  def mtimeMillis(s: String): Long = {
    val p = path(s); fsOf(p).getFileStatus(p).getModificationTime
  }

  /** Stamp a file's modification time (access time untouched). Used to
    * mark the POOL-ENTRY instant of data files: a plain rename preserves
    * the Spark WRITE mtime, which can be arbitrarily older than the move
    * for a long write — and GC grace must age from entry, not write.
    * Stores that don't support setTimes keep their upload time, which IS
    * the entry time there (object-store "rename" creates a new object). */
  def setTimes(s: String, mtimeMs: Long): Unit = {
    val p = path(s)
    try fsOf(p).setTimes(p, mtimeMs, -1)
    catch { case _: UnsupportedOperationException => () }
  }
}

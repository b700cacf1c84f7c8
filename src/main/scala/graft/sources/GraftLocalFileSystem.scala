package graft.sources

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.spark.sql.SparkSession

/** Local `file://` filesystem tuned for the engine's I/O discipline.
  *
  * Hadoop's default local stack costs a SUBPROCESS FORK per file when the
  * native library is absent (every deployment of this sandbox, and any
  * vanilla JVM-only install):
  *
  *  - `LocalFileSystem.create` →  `RawLocalFileSystem.setPermission` →
  *    `Shell.execCommand("chmod", …)` — one fork per created file, plus
  *    one per created directory, plus the `.crc` sidecar's;
  *  - `listLocatedStatus`/`LocatedFileStatus` eagerly read the permission
  *    of a `DeprecatedRawLocalFileStatus` → `ls -ld` — one fork per
  *    LISTED file;
  *  - the checksummed wrapper doubles file count (`.crc` sidecars) and
  *    therefore doubles both costs.
  *
  * A JFR capture of one `call_optimize_scan` bench run measured ~600
  * such forks (≈1.5-2.5 s of blocked wall-clock) — per query. None of
  * this exists on the filesystems a production deployment runs on
  * (s3a/abfs/HDFS-with-native): there are no POSIX permission bits to
  * chmod and no client-side `.crc` sidecars — Iceberg's HadoopFileIO
  * makes exactly the same trade. So the default local stack was taxing
  * the benchmark with work the 100 TB design never performs.
  *
  * This subclass removes the forks while keeping POSIX semantics:
  *
  *  - `setPermission` is a no-op: files/dirs keep the process umask's
  *    modes — the same 644/755 the forked `chmod` was re-applying;
  *  - statuses are materialized with an EAGER fixed permission, so
  *    wrapping them in `LocatedFileStatus` (listings, file indexes)
  *    never lazy-loads via `ls -ld`;
  *  - it extends the RAW filesystem: no `.crc` sidecars (the discipline
  *    [[MetaIO]] already applied to the metadata plane, extended to the
  *    data plane).
  *
  * Installed by the runner mains via [[GraftLocalFs.install]]; opt out
  * with `spark.graft.localfs=default` (restores Hadoop's stock local
  * stack) for A/B measurement.
  */
class GraftLocalFileSystem extends RawLocalFileSystem {

  override def setPermission(p: Path, permission: FsPermission): Unit = ()

  override def getFileStatus(f: Path): FileStatus =
    eager(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] = {
    val ss = super.listStatus(f)
    if (ss == null) null else ss.map(eager)
  }

  /** Copy a (lazily-permissioned) raw status into a plain FileStatus with
    * the permission pre-set — nothing downstream can trigger the shell. */
  private def eager(s: FileStatus): FileStatus =
    if (s == null) s
    else new FileStatus(s.getLen, s.isDirectory, 1, s.getBlockSize,
      s.getModificationTime, s.getAccessTime, GraftLocalFileSystem.Mode,
      "", "", s.getPath)
}

object GraftLocalFileSystem {
  /** rwxr-xr-x: a fixed truthful-enough mode — the engine never makes
    * permission-based decisions, it only needs the field non-null. */
  private[sources] val Mode = FsPermission.createImmutable(Integer.parseInt("755", 8).toShort)
}

/** The [[org.apache.hadoop.fs.FileContext]] twin of
  * [[GraftLocalFileSystem]] — streaming checkpoint managers
  * (offsets/commits/state) resolve `file://` through
  * `fs.AbstractFileSystem.file.impl`, not `fs.file.impl`, so without
  * this binding every micro-batch's checkpoint files still paid the
  * stock local stack's per-file forks. Same no-op-permission raw
  * semantics, delegated. */
class GraftAbstractLocalFs(uri: java.net.URI,
                           conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new GraftLocalFileSystem, conf, "file", false)

object GraftLocalFs {
  /** Bind `file://` to [[GraftLocalFileSystem]] for this JVM. Must run
    * before the first local-filesystem access (the Hadoop FileSystem
    * cache is keyed by scheme, not conf); the runner mains call it right
    * after building their session. Idempotent; `spark.graft.localfs=
    * default` opts out. */
  def install(spark: SparkSession): Unit = {
    if (spark.conf.getOption("spark.graft.localfs").contains("default")) return
    val hc = spark.sparkContext.hadoopConfiguration
    if (hc.get("fs.file.impl") != classOf[GraftLocalFileSystem].getName) {
      hc.set("fs.file.impl", classOf[GraftLocalFileSystem].getName)
      hc.set("fs.AbstractFileSystem.file.impl",
        classOf[GraftAbstractLocalFs].getName)
      // evict any already-cached stock instance so the binding takes
      // effect even when something touched file:// before install
      FileSystem.closeAll()
    }
  }
}

package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Object-store-safe table commit protocol: versioned data directories plus
  * an atomically-flipped pointer file — the minimal form of the snapshot
  * commit the reference gets from Iceberg
  * (`/root/reference/dags/2_bronze_to_silver.py:245-258`: every silver
  * MERGE is an ACID snapshot commit).
  *
  * Layout:
  * {{{
  *   <root>/v=1/part-*.parquet     immutable snapshot 1
  *   <root>/v=2/part-*.parquet     immutable snapshot 2
  *   <root>/_CURRENT               text file holding the live version id
  * }}}
  *
  * Why not rename the data directory (the previous implementation)?
  * Directory rename is atomic only on a real filesystem; on S3-family
  * object stores it is a non-atomic copy+delete of every key, during
  * which readers see a half-table. Here the data files are IMMUTABLE once
  * written — the only mutation is the single-key `_CURRENT` pointer
  * overwrite, which is atomic both locally (ATOMIC_MOVE of a temp file)
  * and on object stores (single-key PUT is all-or-nothing). Readers that
  * resolved the pointer before a commit keep reading their pinned v=N
  * snapshot — writers never touch it — giving snapshot isolation and
  * crash safety: a writer dying mid-write leaves an orphan v=N+1 dir and
  * an untouched pointer, never a corrupt table.
  *
  * Retained versions double as time travel ([[readVersion]]), the
  * degenerate form of Iceberg's snapshot log the reference documents
  * (`/root/reference/README.md:332-340`).
  */
object Versioned {

  private val Pointer = "_CURRENT"

  private def pointerPath(root: String): Path = Paths.get(root, Pointer)

  /** Live version id, if the table exists (committed at least once). */
  def currentVersion(root: String): Option[Long] = {
    val p = pointerPath(root)
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  def exists(root: String): Boolean = currentVersion(root).isDefined

  /** Data directory of the live snapshot. */
  def currentPath(root: String): Option[String] =
    currentVersion(root).map(v => s"$root/v=$v")

  /** Read the live snapshot. */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(currentPath(root).getOrElse(
      throw new IllegalStateException(s"no committed version under $root")))

  /** Time travel: read a specific retained snapshot. */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame = {
    val dir = s"$root/v=$version"
    require(Files.exists(Paths.get(dir)),
      s"version $version of $root does not exist (GC'd or never committed)")
    spark.read.parquet(dir)
  }

  /** All retained snapshot ids, ascending — the snapshot log. */
  def versions(root: String): Seq[Long] = {
    val d = Paths.get(root)
    if (!Files.isDirectory(d)) Nil
    else {
      val s = Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .map(_.getFileName.toString)
          .collect { case n if n.startsWith("v=") => n.drop(2).toLong }
          .toSeq.sorted
      } finally s.close()
    }
  }

  /** Commit `df` as the next snapshot of `root` and flip the pointer.
    * Old snapshots beyond `retain` are GC'd AFTER the flip (a failed GC
    * leaves garbage, never a broken table). Returns the new version id. */
  def commit(df: DataFrame, root: String, retain: Int = 2): Long = {
    require(retain >= 1, "must retain at least the live snapshot")
    val next = currentVersion(root).getOrElse(0L) + 1
    df.write.mode("overwrite").parquet(s"$root/v=$next")

    // single-key atomic pointer flip: temp file + ATOMIC_MOVE locally,
    // a plain PUT on an object store.
    val tmp = Paths.get(root, s"$Pointer.tmp")
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointerPath(root),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)

    versions(root).filter(_ <= next - retain).foreach { v =>
      deleteRecursively(Paths.get(s"$root/v=$v"))
    }
    next
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.foreach(deleteRecursively)
      } finally s.close()
    }
    Files.deleteIfExists(p)
  }
}

package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Manifest-based table format: immutable data files in a shared pool,
  * each version a MANIFEST (file list), commits an atomic pointer flip.
  *
  * [[Versioned]] copies the whole table per snapshot — fine for the
  * medallion swap it implements, wrong at 100 TB where a MERGE touches a
  * sliver of the data. This is the shape Iceberg actually uses
  * (`/root/reference/dags/2_bronze_to_silver.py:245-258` commits behave
  * this way): unchanged files are REFERENCED by the new manifest, never
  * rewritten, so commit cost is proportional to the data that changed,
  * not to table size; retained manifests share files, which makes time
  * travel free and GC a reference count.
  *
  * Layout:
  * {{{
  *   <root>/data/__day=D/<uuid>.parquet   immutable data files (partitioned)
  *   <root>/data/<uuid>.parquet           (unpartitioned tables)
  *   <root>/manifests/v=N.txt             one relative file path per line
  *   <root>/_CURRENT                      live version id (atomic flip)
  * }}}
  *
  * The hidden day partition rides in the directory name, exactly like the
  * parquet layout Spark itself writes; reads pass the manifest's file
  * list with `basePath` so Spark re-derives the partition column, and
  * [[readDayRange]] prunes AT THE MANIFEST level — the scan never opens a
  * file outside the requested days (Iceberg's scan planning, re-expressed).
  *
  * Crash safety mirrors [[Versioned]]: data files and manifests are
  * written before the single-key `_CURRENT` flip; a writer dying mid-
  * commit leaves orphan files that the next successful commit's GC
  * sweeps, never a broken table. (On an object store the stage→pool move
  * is a server-side copy per NEW file only; Iceberg avoids even that with
  * custom committers — out of scope here.)
  *
  * Concurrency: each committer CLAIMS its version by creating
  * `v=N+1.txt` with create-new semantics (the one atomic win-or-fail
  * primitive POSIX files give; conditional PUT on an object store), so
  * two writers racing for the same version produce one winner and one
  * `FileAlreadyExistsException` BEFORE any pointer moves — a silent lost
  * update becomes a detectable commit failure the caller retries against
  * the new live state. Full multi-writer serialization (Iceberg's
  * retry-CAS on the metadata pointer via a metastore lock) is out of
  * scope: the supported model is one committer per table at a time, with
  * races detected rather than absorbed.
  */
object ManifestTable {

  private val Pointer = "_CURRENT"
  /** Hidden partition directory prefix (same column name Versioned uses). */
  val DayCol = "__day"

  private def pointerPath(root: String): Path = Paths.get(root, Pointer)

  def currentVersion(root: String): Option[Long] = {
    val p = pointerPath(root)
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  def exists(root: String): Boolean = currentVersion(root).isDefined

  def versions(root: String): Seq[Long] = {
    val d = Paths.get(root, "manifests")
    if (!Files.isDirectory(d)) Nil
    else {
      val s = Files.list(d)
      try s.iterator().asScala.map(_.getFileName.toString)
        .collect { case n if n.startsWith("v=") && n.endsWith(".txt") =>
          n.stripPrefix("v=").stripSuffix(".txt").toLong }
        .toSeq.sorted
      finally s.close()
    }
  }

  /** Relative data-file paths of one manifest (property lines skipped). */
  def manifest(root: String, v: Long): Seq[String] =
    manifestLines(root, v).filter(l => l.nonEmpty && !l.startsWith("#"))

  /** Commit properties of one manifest (`#key=value` header lines) — the
    * degenerate form of Iceberg's snapshot summary / Delta's txn actions.
    * Carried forward by [[append]] so the live snapshot always exposes
    * the latest value per key (streaming sinks store their last batch id
    * here, giving exactly-once appends under foreachBatch retries). */
  def manifestProps(root: String, v: Long): Map[String, String] =
    manifestLines(root, v).filter(_.startsWith("#")).map { l =>
      val kv = l.drop(1).split("=", 2)
      kv(0) -> (if (kv.length > 1) kv(1) else "")
    }.toMap

  /** Properties of the live manifest (empty if never committed). */
  def liveProps(root: String): Map[String, String] =
    currentVersion(root).map(manifestProps(root, _)).getOrElse(Map.empty)

  private def manifestLines(root: String, v: Long): Seq[String] = {
    val p = Paths.get(root, "manifests", s"v=$v.txt")
    require(Files.exists(p), s"manifest v=$v of $root does not exist")
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .linesIterator.toSeq
  }

  private def liveManifest(root: String): Seq[String] =
    manifest(root, currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no committed version under $root")))

  /** Day value of a manifest entry, None for unpartitioned files. */
  private def dayOf(rel: String): Option[String] =
    if (rel.startsWith(s"$DayCol=")) Some(rel.takeWhile(_ != '/').stripPrefix(s"$DayCol="))
    else None

  /** Distinct hidden-day values present in the live manifest. */
  def liveDays(root: String): Set[String] = liveManifest(root).flatMap(dayOf).toSet

  private def readFiles(spark: SparkSession, root: String, rels: Seq[String]): DataFrame = {
    require(rels.nonEmpty, s"empty manifest under $root — empty commits are not supported")
    spark.read.option("basePath", s"$root/data")
      .parquet(rels.map(r => s"$root/data/$r"): _*)
  }

  /** Live snapshot, hidden partition column stripped. */
  def read(spark: SparkSession, root: String): DataFrame =
    readRaw(spark, root).drop(DayCol)

  /** Live snapshot with the hidden day column exposed (internal plumbing
    * for partition-scoped rewrites). */
  private[graft] def readRaw(spark: SparkSession, root: String): DataFrame =
    readFiles(spark, root, liveManifest(root))

  /** Time travel: a retained manifest's snapshot. */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame =
    readFiles(spark, root, manifest(root, v)).drop(DayCol)

  /** Timestamp-range read with MANIFEST-level pruning: files of
    * out-of-range days are never handed to the scan. */
  def readDayRange(spark: SparkSession, root: String, tsCol: String,
                   fromTs: String, untilTs: String): DataFrame = {
    val fromD = java.time.LocalDate.parse(fromTs.take(10))
    val untilD = java.time.LocalDate.parse(untilTs.take(10))
    val picked = liveManifest(root).filter { rel =>
      dayOf(rel).exists { d =>
        val day = java.time.LocalDate.parse(d)
        !day.isBefore(fromD) && !day.isAfter(untilD)
      }
    }
    readFiles(spark, root, picked)
      .where(col(tsCol) >= lit(fromTs).cast("timestamp")
        && col(tsCol) < lit(untilTs).cast("timestamp"))
      .drop(DayCol)
  }

  /** Write `df`'s files into the pool (staged, then moved in — invisible
    * until a manifest references them) and return their relative paths. */
  private def writePool(df: DataFrame, root: String,
                        partitionDayOf: Option[String]): Seq[String] = {
    val stage = s"$root/stage/${UUID.randomUUID().toString.take(12)}"
    partitionDayOf match {
      case Some(ts) =>
        df.withColumn(DayCol, to_date(col(ts)))
          .write.partitionBy(DayCol).parquet(stage)
      case None =>
        df.write.parquet(stage)
    }
    val stageP = Paths.get(stage)
    val parts = {
      val s = Files.walk(stageP)
      try s.iterator().asScala.filter(p =>
        Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet")).toVector
      finally s.close()
    }
    val rels = parts.map { p =>
      val sub = stageP.relativize(p.getParent).toString // "" or "__day=D"
      val name = s"${UUID.randomUUID().toString.take(16)}.parquet"
      val rel = if (sub.isEmpty) name else s"$sub/$name"
      val dest = Paths.get(s"$root/data/$rel")
      Files.createDirectories(dest.getParent)
      Files.move(p, dest, StandardCopyOption.ATOMIC_MOVE)
      rel
    }
    deleteRecursively(stageP)
    rels
  }

  private def commitManifest(root: String, rels: Seq[String], retain: Int,
                             props: Map[String, String] = Map.empty): Long = {
    require(props.keys.forall(k => !k.contains("=") && !k.contains("\n"))
      && props.values.forall(v => !v.contains("\n")), "illegal manifest property")
    val next = currentVersion(root).getOrElse(0L) + 1
    val mdir = Paths.get(root, "manifests")
    Files.createDirectories(mdir)
    // optimistic-concurrency CLAIM: create-new is the one atomic
    // win-or-fail primitive POSIX gives (rename REPLACES silently — a
    // tmp+move dance would let a racing committer overwrite this
    // manifest and GC the loser's files: a true lost update). On an
    // object store the analog is a conditional PUT (If-None-Match).
    // Readers never see a half-written manifest because nothing points
    // at it until the pointer flip below.
    val target = mdir.resolve(s"v=$next.txt")
    Files.createFile(target) // throws FileAlreadyExistsException on conflict
    val body = props.toSeq.sortBy(_._1).map { case (k, v) => s"#$k=$v" } ++ rels
    Files.write(target, body.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val ptmp = Paths.get(root, s"$Pointer.tmp")
    Files.write(ptmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(ptmp, pointerPath(root),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    gc(root, next, retain)
    next
  }

  /** Full-table commit: every row of `df` becomes the new snapshot.
    * `props` REPLACE the previous commit's properties (an overwrite is a
    * new history; pass `liveProps(root)` to carry them). */
  def commit(df: DataFrame, root: String, retain: Int = 2,
             partitionDayOf: Option[String] = None,
             props: Map[String, String] = Map.empty): Long = {
    require(retain >= 1, "must retain at least the live snapshot")
    commitManifest(root, writePool(df, root, partitionDayOf), retain, props)
  }

  /** Append commit (INSERT INTO semantics): write only `df`'s files into
    * the pool and publish a manifest referencing live ∪ new — commit cost
    * proportional to the appended data, never to table size (the property
    * that makes per-batch ingestion viable at 100 TB). First append on an
    * empty table degenerates to [[commit]]. */
  def append(df: DataFrame, root: String, retain: Int = 2,
             partitionDayOf: Option[String] = None,
             props: Map[String, String] = Map.empty): Long = {
    require(retain >= 1, "must retain at least the live snapshot")
    val keep = if (exists(root)) liveManifest(root) else Nil
    // inherited ++ new: the live manifest always exposes the latest value
    // per property key, so idempotence markers survive later appends
    commitManifest(root, keep ++ writePool(df, root, partitionDayOf), retain,
      props = liveProps(root) ++ props)
  }

  /** Partition-scoped commit: replace the named days with `df`'s rows;
    * files of every other day are carried into the new manifest untouched
    * (this is the Iceberg copy-on-write property — commit cost follows
    * the touched data, not the table). `df` must be the FULL new contents
    * of `removeDays` (plus any rows landing in other days, which append
    * to those days). */
  def replaceDays(df: DataFrame, root: String, removeDays: Set[String],
                  partitionDayOf: String, retain: Int = 2): Long = {
    val keep = liveManifest(root).filter(rel => dayOf(rel) match {
      case Some(d) => !removeDays.contains(d)
      case None => throw new IllegalStateException(
        s"$root holds unpartitioned files; replaceDays needs a day-partitioned table")
    })
    val fresh = writePool(df, root, Some(partitionDayOf))
    // partial update of a continuing table: carry the commit properties
    // (e.g. streaming idempotence markers) into the new manifest
    commitManifest(root, keep ++ fresh, retain = retain, props = liveProps(root))
  }

  /** Metadata-only day drop — the retention-DELETE fast path: remove the
    * named days' files from the manifest and flip the pointer. NO data is
    * read or written; cost is one manifest write regardless of table
    * size. Refuses to commit an empty table (empty manifests are not
    * representable — drop the table instead). */
  def dropDays(root: String, removeDays: Set[String], retain: Int = 2): Long = {
    val keep = liveManifest(root).filter(rel => dayOf(rel) match {
      case Some(d) => !removeDays.contains(d)
      case None => throw new IllegalStateException(
        s"$root holds unpartitioned files; dropDays needs a day-partitioned table")
    })
    require(keep.nonEmpty,
      s"dropDays would empty $root; DROP the table (or overwrite) instead")
    commitManifest(root, keep, retain = retain, props = liveProps(root))
  }

  /** Drop manifests beyond `retain`, then delete pool files no retained
    * manifest references (runs after the flip: a failed GC leaves orphans,
    * never a broken table). */
  private def gc(root: String, live: Long, retain: Int): Unit = {
    val (dead, kept) = versions(root).partition(_ <= live - retain)
    dead.foreach(v => Files.deleteIfExists(Paths.get(root, "manifests", s"v=$v.txt")))
    val referenced = kept.flatMap(v => manifest(root, v)).toSet
    val dataDir = Paths.get(root, "data")
    if (Files.isDirectory(dataDir)) {
      val s = Files.walk(dataDir)
      val all = try s.iterator().asScala.filter(Files.isRegularFile(_)).toVector finally s.close()
      all.foreach { p =>
        if (!referenced.contains(dataDir.relativize(p).toString)) Files.deleteIfExists(p)
      }
    }
  }

  /** `TIMESTAMP AS OF` resolution: the latest manifest committed at or
    * before the instant (manifest-file mtime = commit instant — data files
    * are shared across manifests, so their mtimes don't identify commits). */
  def versionAsOf(root: String, epochMillis: Long): Long = {
    val cands = versions(root).filter(v =>
      Files.getLastModifiedTime(Paths.get(root, "manifests", s"v=$v.txt")).toMillis <= epochMillis)
    require(cands.nonEmpty,
      s"no retained snapshot of $root committed at or before epoch-ms $epochMillis")
    cands.max
  }

  /** Snapshot history metadata table: one row per retained manifest. */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val live = currentVersion(root)
    versions(root).map { v =>
      val rels = manifest(root, v)
      val sizes = rels.map(r => Files.size(Paths.get(s"$root/data/$r")))
      (v, rels.size.toLong, sizes.sum, live.contains(v))
    }.toDF("version", "n_files", "bytes", "is_current")
  }

  /** Small-file compaction (Iceberg's `rewrite_data_files`): rewrite the
    * live snapshot into ~`targetFileBytes` files per day and commit; old
    * files age out with their manifests. Data is unchanged — only layout. */
  def compact(spark: SparkSession, root: String, partitionDayOf: Option[String],
              targetFileBytes: Long = 128L << 20, retain: Int = 2): Long = {
    val rels = liveManifest(root)
    val totalBytes = rels.map(r => Files.size(Paths.get(s"$root/data/$r"))).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = partitionDayOf match {
      // repartition by day so each partition dir gets locally-coalesced files
      case Some(_) => readRaw(spark, root).repartition(nFiles, col(DayCol)).drop(DayCol)
      case None    => read(spark, root).repartition(nFiles)
    }
    // layout maintenance continues the table's history: carry properties
    // (a lost streaming marker would let a replayed batch double-append)
    commit(df, root, retain = retain, partitionDayOf = partitionDayOf,
      props = liveProps(root))
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.foreach(deleteRecursively) finally s.close()
    }
    Files.deleteIfExists(p)
  }
}

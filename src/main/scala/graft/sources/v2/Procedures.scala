package graft.sources.v2

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The SQL `CALL` surface for table maintenance — the stored-procedure
  * ergonomics the reference gets from Iceberg
  * (`CALL catalog.system.rewrite_data_files(...)`,
  * `/root/reference/README.md:332-340` area documents the Iceberg
  * capabilities) on Spark 4's `ProcedureCatalog`:
  *
  * {{{
  *   CALL cat.system.optimize(`table` => 'ns.tbl'
  *     [, target_file_bytes => N] [, zorder_by => 'x,y'])
  *   CALL cat.system.expire_snapshots(`table` => 'ns.tbl' [, retain => N])
  *   CALL cat.system.delete_older_than(`table` => 'ns.tbl',
  *     older_than => 'yyyy-MM-dd HH:mm:ss')
  * }}}
  *
  * Each procedure delegates to [[Maintenance]] (format/partition/
  * rename-aware resolution from the catalog descriptor) and returns a
  * one-row result set via a [[LocalScan]].
  */
object GraftProcedures {

  val Names: Seq[String] = Seq("optimize", "expire_snapshots", "delete_older_than",
    "create_tag", "create_branch", "drop_ref", "fast_forward", "evolve_partition",
    "rewrite_deletes", "rollback_to_version", "rollback_to_timestamp",
    "cherrypick_snapshot", "fsck", "remove_orphan_files", "compute_stats",
    "localize")

  private def spark: SparkSession = SparkSession.active

  private def param(name: String, dt: DataType, default: Option[String] = None)
      : ProcedureParameter = {
    val b = ProcedureParameter.in(name, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  /** One-row result-set scan. */
  private case class ResultScan(schema: StructType, row: InternalRow) extends LocalScan {
    override def rows(): Array[InternalRow] = Array(row)
    override def readSchema(): StructType = schema
  }

  /** Multi-row result-set scan (one row per swept file, etc). */
  private case class RowsScan(schema: StructType, all: Array[InternalRow])
      extends LocalScan {
    override def rows(): Array[InternalRow] = all
    override def readSchema(): StructType = schema
  }

  private abstract class GraftProcedure(procName: String) extends UnboundProcedure
      with BoundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft table maintenance: $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
  }

  def load(catalogName: String, name: String): UnboundProcedure = name match {
    case "optimize" => new GraftProcedure("optimize") {
      override def parameters(): Array[ProcedureParameter] = Array(
        param("table", StringType),
        param("target_file_bytes", LongType, Some((128L << 20).toString)),
        param("zorder_by", StringType, Some("''")),
        // inclusive day range 'YYYY-MM-DD,YYYY-MM-DD': compact ONLY those
        // days (Iceberg's rewrite_data_files(filter) shape)
        param("where_days", StringType, Some("''")),
        // >1 = partial progress (Iceberg's partial-progress.max-commits):
        // the rewrite chunks into up to N independent day-scoped commits
        param("max_commits", IntegerType, Some("1")),
        // with max_commits > 1: rewrite up to M chunks concurrently
        // (Iceberg's max-concurrent-file-group-rewrites); the commits
        // still serialize through the optimistic commit loop
        param("max_concurrent_rewrites", IntegerType, Some("1")),
        // identity layouts: compact ONLY the named partition keys —
        // exact ('ano=2024/mes=5') or prefix ('ano=2024'), comma-
        // separated (Iceberg's rewrite_data_files partition filter)
        param("where_keys", StringType, Some("''")))
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val tbl = input.getUTF8String(0).toString
        val target = input.getLong(1)
        val zorder = input.getUTF8String(2).toString.split(',')
          .map(_.trim).filter(_.nonEmpty).toSeq
        val whereDays = Some(input.getUTF8String(3).toString.trim)
          .filter(_.nonEmpty).map { s =>
            val p = s.split(',').map(_.trim)
            require(p.length == 2,
              "where_days takes 'YYYY-MM-DD,YYYY-MM-DD' (inclusive)")
            (p(0), p(1))
          }
        val whereKeys = input.getUTF8String(6).toString.split(',')
          .map(_.trim).filter(_.nonEmpty).toSeq
        val v = Maintenance.optimize(spark, s"$catalogName.$tbl", target, zorder,
          whereDays, maxCommits = input.getInt(4),
          maxConcurrentRewrites = input.getInt(5), whereKeys = whereKeys)
        Collections.singletonList[Scan](ResultScan(
          StructType(Seq(StructField("version", LongType, nullable = false))),
          new GenericInternalRow(Array[Any](v)))).iterator()
      }
    }
    case "clone" => new GraftProcedure("clone") {
      // SHALLOW CLONE: CALL cat.system.clone('ns.src', 'ns.dst') — a
      // zero-copy snapshot of the source's live version (Delta's
      // CREATE TABLE … SHALLOW CLONE)
      override def parameters(): Array[ProcedureParameter] = Array(
        param("source", StringType),
        param("target", StringType))
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val src = input.getUTF8String(0).toString
        val dst = input.getUTF8String(1).toString
        val v = Maintenance.cloneTable(spark, s"$catalogName.$src", s"$catalogName.$dst")
        Collections.singletonList[Scan](ResultScan(
          StructType(Seq(StructField("version", LongType, nullable = false))),
          new GenericInternalRow(Array[Any](v)))).iterator()
      }
    }
    case "localize" => new GraftProcedure("localize") {
      // materialize a shallow clone's ext/ references into its own pool:
      // CALL cat.system.localize(`table` => 'ns.t') — after it the table
      // clones freely and source expiry cannot strand its live snapshot
      override def parameters(): Array[ProcedureParameter] = Array(
        param("table", StringType))
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val tbl = input.getUTF8String(0).toString
        val (v, copied) = Maintenance.localize(spark, s"$catalogName.$tbl")
        Collections.singletonList[Scan](ResultScan(
          StructType(Seq(
            StructField("version", LongType, nullable = false),
            StructField("files_copied", LongType, nullable = false))),
          new GenericInternalRow(Array[Any](v, copied)))).iterator()
      }
    }
    case "rewrite_deletes" => new GraftProcedure("rewrite_deletes") {
      override def parameters(): Array[ProcedureParameter] = Array(
        param("table", StringType))
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val tbl = input.getUTF8String(0).toString
        val (root, _) = Maintenance.resolve(spark, s"$catalogName.$tbl")
        val before = graft.sources.ManifestTable.liveDeleteEntries(root).size.toLong
        val v = Maintenance.rewriteDeletes(spark, s"$catalogName.$tbl")
        val after = graft.sources.ManifestTable.liveDeleteEntries(root).size.toLong
        Collections.singletonList[Scan](ResultScan(
          StructType(Seq(
            StructField("version", LongType, nullable = false),
            StructField("delete_files_before", LongType, nullable = false),
            StructField("delete_files_after", LongType, nullable = false))),
          new GenericInternalRow(Array[Any](v, before, after)))).iterator()
      }
    }
    case "expire_snapshots" => new GraftProcedure("expire_snapshots") {
      override def parameters(): Array[ProcedureParameter] = Array(
        param("table", StringType),
        param("retain", IntegerType, Some("1")),
        param("older_than", StringType, Some("''")))
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val tbl = input.getUTF8String(0).toString
        Maintenance.expireSnapshots(spark, s"$catalogName.$tbl", input.getInt(1),
          Some(input.getUTF8String(2).toString).filter(_.nonEmpty))
        Collections.singletonList[Scan](ResultScan(
          StructType(Seq(StructField("status", StringType, nullable = false))),
          new GenericInternalRow(Array[Any](UTF8String.fromString("expired"))))).iterator()
      }
    }
    case "delete_older_than" => new GraftProcedure("delete_older_than") {
      override def parameters(): Array[ProcedureParameter] = Array(
        param("table", StringType),
        param("older_than", StringType))
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val tbl = input.getUTF8String(0).toString
        Maintenance.deleteOlderThan(spark, s"$catalogName.$tbl",
          input.getUTF8String(1).toString)
        Collections.singletonList[Scan](ResultScan(
          StructType(Seq(StructField("status", StringType, nullable = false))),
          new GenericInternalRow(Array[Any](UTF8String.fromString("deleted"))))).iterator()
      }
    }
    // ---- named refs (Iceberg's create_tag / create_branch /
    // remove_tag+remove_branch / fast_forward CALL surface) ----
    case "create_tag" => new GraftProcedure("create_tag") {
      override def parameters(): Array[ProcedureParameter] = Array(
        param("table", StringType),
        param("name", StringType),
        param("version", LongType, Some("-1")))
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (root, _) = Maintenance.resolve(spark,
          s"$catalogName.${input.getUTF8String(0).toString}")
        val v = graft.sources.ManifestTable.createTag(root,
          input.getUTF8String(1).toString,
          Some(input.getLong(2)).filter(_ >= 0))
        Collections.singletonList[Scan](ResultScan(
          StructType(Seq(StructField("version", LongType, nullable = false))),
          new GenericInternalRow(Array[Any](v)))).iterator()
      }
    }
    case "create_branch" => new GraftProcedure("create_branch") {
      override def parameters(): Array[ProcedureParameter] = Array(
        param("table", StringType),
        param("name", StringType),
        param("version", LongType, Some("-1")))
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (root, _) = Maintenance.resolve(spark,
          s"$catalogName.${input.getUTF8String(0).toString}")
        val v = graft.sources.ManifestTable.createBranch(root,
          input.getUTF8String(1).toString,
          Some(input.getLong(2)).filter(_ >= 0))
        Collections.singletonList[Scan](ResultScan(
          StructType(Seq(StructField("version", LongType, nullable = false))),
          new GenericInternalRow(Array[Any](v)))).iterator()
      }
    }
    case "drop_ref" => new GraftProcedure("drop_ref") {
      override def parameters(): Array[ProcedureParameter] = Array(
        param("table", StringType),
        param("name", StringType))
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (root, _) = Maintenance.resolve(spark,
          s"$catalogName.${input.getUTF8String(0).toString}")
        graft.sources.ManifestTable.dropRef(root, input.getUTF8String(1).toString)
        Collections.singletonList[Scan](ResultScan(
          StructType(Seq(StructField("status", StringType, nullable = false))),
          new GenericInternalRow(Array[Any](UTF8String.fromString("dropped")))))
          .iterator()
      }
    }
    case "fast_forward" => new GraftProcedure("fast_forward") {
      override def parameters(): Array[ProcedureParameter] = Array(
        param("table", StringType),
        param("branch", StringType))
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (root, _) = Maintenance.resolve(spark,
          s"$catalogName.${input.getUTF8String(0).toString}")
        val v = graft.sources.ManifestTable.publishBranch(root,
          input.getUTF8String(1).toString)
        Collections.singletonList[Scan](ResultScan(
          StructType(Seq(StructField("version", LongType, nullable = false))),
          new GenericInternalRow(Array[Any](v)))).iterator()
      }
    }
    // explicit NDV statistics (re)build — Iceberg's ANALYZE shape: one
    // distributed scan of the live snapshot, sketch published at the
    // live version; one row per column with its estimate
    case "compute_stats" => new GraftProcedure("compute_stats") {
      override def parameters(): Array[ProcedureParameter] = Array(
        param("table", StringType))
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val est = Maintenance.computeStats(spark,
          s"$catalogName.${input.getUTF8String(0).toString}")
        Collections.singletonList[Scan](RowsScan(
          StructType(Seq(
            StructField("column", StringType, nullable = false),
            StructField("ndv", LongType, nullable = false))),
          est.toSeq.sortBy(_._1).map { case (c, n) =>
            new GenericInternalRow(
              Array[Any](UTF8String.fromString(c), n)): InternalRow }
            .toArray)).iterator()
      }
    }
    // standalone orphan-file sweep (Iceberg's remove_orphan_files):
    // grace-windowed, ref-sparing, dry-run listing — one row per file
    case "remove_orphan_files" => new GraftProcedure("remove_orphan_files") {
      override def parameters(): Array[ProcedureParameter] = Array(
        param("table", StringType),
        param("older_than", StringType, Some("''")),
        param("dry_run", BooleanType, Some("false")))
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val dry = input.getBoolean(2)
        val paths = Maintenance.removeOrphanFiles(spark,
          s"$catalogName.${input.getUTF8String(0).toString}",
          Some(input.getUTF8String(1).toString.trim).filter(_.nonEmpty), dry)
        Collections.singletonList[Scan](RowsScan(
          StructType(Seq(
            StructField("orphan_file_location", StringType, nullable = false),
            StructField("deleted", BooleanType, nullable = false))),
          paths.map(p => new GenericInternalRow(
            Array[Any](UTF8String.fromString(p), !dry)): InternalRow)
            .toArray)).iterator()
      }
    }
    // table integrity check: distributed file-existence probe + manifest
    // invariants, no data read (see Maintenance.fsck)
    case "fsck" => new GraftProcedure("fsck") {
      override def parameters(): Array[ProcedureParameter] = Array(
        param("table", StringType))
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (v, nData, nDel, miss, badDv, inert, corrupt, badSeq, healthy) =
          Maintenance.fsck(spark,
            s"$catalogName.${input.getUTF8String(0).toString}")
        Collections.singletonList[Scan](ResultScan(
          StructType(Seq(
            StructField("version", LongType, nullable = false),
            StructField("data_files", LongType, nullable = false),
            StructField("delete_entries", LongType, nullable = false),
            StructField("missing_files", LongType, nullable = false),
            StructField("bad_dvs", LongType, nullable = false),
            StructField("inert_deletes", LongType, nullable = false),
            StructField("corrupt_dvs", LongType, nullable = false),
            StructField("bad_sequences", LongType, nullable = false),
            StructField("healthy", BooleanType, nullable = false))),
          new GenericInternalRow(Array[Any](
            v, nData, nDel, miss, badDv, inert, corrupt, badSeq, healthy)))).iterator()
      }
    }
    // ---- rollback (Delta RESTORE / Iceberg rollback_to_snapshot):
    // restore an earlier retained snapshot as a NEW commit — pure
    // metadata, history preserved, change horizon stamped by the commit
    // loop when data files are un-inserted ----
    case "rollback_to_version" => new GraftProcedure("rollback_to_version") {
      override def parameters(): Array[ProcedureParameter] = Array(
        param("table", StringType),
        param("version", LongType))
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (root, _) = Maintenance.resolve(spark,
          s"$catalogName.${input.getUTF8String(0).toString}")
        // the head actually replaced: the BRANCH head under a write
        // branch, else main's pointer
        val prev = graft.sources.ManifestTable.writeBaseVersion(root).getOrElse(-1L)
        val v = graft.sources.ManifestTable.rollbackTo(root, input.getLong(1),
          VersionedCatalog.retainFor(root, spark))
        Collections.singletonList[Scan](ResultScan(
          StructType(Seq(
            StructField("previous_version", LongType, nullable = false),
            StructField("restored_version", LongType, nullable = false),
            StructField("new_version", LongType, nullable = false))),
          new GenericInternalRow(Array[Any](prev, input.getLong(1), v)))).iterator()
      }
    }
    case "rollback_to_timestamp" => new GraftProcedure("rollback_to_timestamp") {
      override def parameters(): Array[ProcedureParameter] = Array(
        param("table", StringType),
        param("older_than", StringType))
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (root, _) = Maintenance.resolve(spark,
          s"$catalogName.${input.getUTF8String(0).toString}")
        // 'yyyy-MM-dd HH:mm:ss' in the session zone — the same literal
        // shape expire_snapshots / delete_older_than take
        val epochMs = java.time.LocalDateTime
          .parse(input.getUTF8String(1).toString.replace(' ', 'T'))
          .atZone(java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone))
          .toInstant.toEpochMilli
        val prev = graft.sources.ManifestTable.writeBaseVersion(root).getOrElse(-1L)
        val v = graft.sources.ManifestTable.rollbackToTimestamp(root, epochMs,
          VersionedCatalog.retainFor(root, spark))
        val target = graft.sources.ManifestTable.parentOf(root, v).getOrElse(-1L)
        Collections.singletonList[Scan](ResultScan(
          StructType(Seq(
            StructField("previous_version", LongType, nullable = false),
            StructField("restored_version", LongType, nullable = false),
            StructField("new_version", LongType, nullable = false))),
          new GenericInternalRow(Array[Any](prev, target, v)))).iterator()
      }
    }
    // Iceberg's cherrypick_snapshot: republish ONE audited append commit
    // (typically staged on a WAP branch) onto the head, without the rest
    case "cherrypick_snapshot" => new GraftProcedure("cherrypick_snapshot") {
      override def parameters(): Array[ProcedureParameter] = Array(
        param("table", StringType),
        param("version", LongType))
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (root, _) = Maintenance.resolve(spark,
          s"$catalogName.${input.getUTF8String(0).toString}")
        val v = graft.sources.ManifestTable.cherrypick(root, input.getLong(1),
          VersionedCatalog.retainFor(root, spark))
        Collections.singletonList[Scan](ResultScan(
          StructType(Seq(
            StructField("source_version", LongType, nullable = false),
            StructField("new_version", LongType, nullable = false))),
          new GenericInternalRow(Array[Any](input.getLong(1), v)))).iterator()
      }
    }
    case "evolve_partition" => new GraftProcedure("evolve_partition") {
      override def parameters(): Array[ProcedureParameter] = Array(
        param("table", StringType),
        param("spec", StringType))
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        Maintenance.evolvePartition(spark,
          s"$catalogName.${input.getUTF8String(0).toString}",
          input.getUTF8String(1).toString)
        Collections.singletonList[Scan](ResultScan(
          StructType(Seq(StructField("status", StringType, nullable = false))),
          new GenericInternalRow(Array[Any](UTF8String.fromString("evolved")))))
          .iterator()
      }
    }
    case other => throw new IllegalArgumentException(
      s"no such procedure $catalogName.system.$other (one of ${Names.mkString(", ")})")
  }
}

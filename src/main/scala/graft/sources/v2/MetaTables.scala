package graft.sources.v2

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{FileStats, ManifestTable, MetaIO, NdvStats}

/** Iceberg's metadata-table inspection surface (`tbl.files`,
  * `tbl.snapshots`, `tbl.partitions` — the reference gets it from the
  * Iceberg jar for free) for versioned catalog tables: a dotted suffix on
  * the table identifier resolves to a driver-local V2 relation over the
  * MANIFEST — pure metadata, no data file is opened, any SQL composes on
  * top. Row counts are bounded by the manifest (file count / retained
  * versions), which is exactly the scale at which a driver-local scan is
  * the right physical plan. */
object MetaTables {

  val Kinds: Set[String] = Set("files", "snapshots", "partitions", "deletes", "refs",
    "changes", "stats")

  private val FilesSchema = StructType(Seq(
    StructField("file_path", StringType, nullable = false),
    StructField("partition", StringType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("is_delete_file", BooleanType, nullable = false),
    StructField("stats", StringType, nullable = true)))

  private val SnapshotsSchema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("committed_at", TimestampType, nullable = false),
    StructField("operation", StringType, nullable = true),
    StructField("n_data_files", LongType, nullable = false),
    StructField("n_delete_files", LongType, nullable = false),
    StructField("total_bytes", LongType, nullable = false),
    StructField("is_current", BooleanType, nullable = false),
    // lineage stamps (absent on manifests committed before they existed):
    // the logical parent version and the ref the commit landed on —
    // Iceberg's snapshot parent-id and ref, straight off the manifest head
    StructField("parent", LongType, nullable = true),
    StructField("ref_owner", StringType, nullable = true)))

  private val PartitionsSchema = StructType(Seq(
    StructField("partition", StringType, nullable = false),
    StructField("n_files", LongType, nullable = false),
    StructField("total_bytes", LongType, nullable = false)))

  private val DeletesSchema = StructType(Seq(
    StructField("file_path", StringType, nullable = false),
    StructField("delete_kind", StringType, nullable = false), // positional|equality
    StructField("sequence", LongType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("targets", StringType, nullable = true)))     // positional: files list

  // the planner-statistics inspection surface: what CBO sees per column
  // ([[ColumnStatsReport]] — NDV from the commit-time sketch, bounds/nulls
  // folded from the live manifest; canonical strings for display)
  private val StatsSchema = StructType(Seq(
    StructField("column", StringType, nullable = false),
    StructField("ndv", LongType, nullable = true),
    StructField("min", StringType, nullable = true),
    StructField("max", StringType, nullable = true),
    StructField("null_count", LongType, nullable = true),
    StructField("n_rows", LongType, nullable = true),
    // the version whose sidecar the NDV resolved from, and whether a
    // row-adding commit since then carried no sketch (the estimate
    // under-counts until compute_stats re-bases it — see NdvStats)
    StructField("stats_version", LongType, nullable = true),
    StructField("stale", BooleanType, nullable = true)))

  private val RefsSchema = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),    // tag|branch
    StructField("version", LongType, nullable = false),
    StructField("is_current", BooleanType, nullable = false)))

  def load(name: String, root: String, kind: String,
           pinnedVersion: Option[Long] = None): Table = {
    require(pinnedVersion.isEmpty || kind == "changes",
      s"metadata table '$kind' is not version-addressable " +
        "(only tbl.changes supports VERSION AS OF)")
    kind match {
      case "files"      => MetaTable(name, FilesSchema, () => filesRows(root))
      case "snapshots"  => MetaTable(name, SnapshotsSchema, () => snapshotRows(root))
      case "partitions" => MetaTable(name, PartitionsSchema, () => partitionRows(root))
      case "deletes"    => MetaTable(name, DeletesSchema, () => deleteRows(root))
      case "refs"       => MetaTable(name, RefsSchema, () => refRows(root))
      case "stats"      => MetaTable(name, StatsSchema, () => statsRows(root))
      // row-level change feed — a full distributed relation, not a
      // driver-local listing ([[ChangeFeed]]); a pin caps its end
      case "changes"    => ChangeFeed.table(name, root, pinnedVersion)
      case other => throw new IllegalArgumentException(s"no metadata table $other")
    }
  }

  private def utf8(s: String) = UTF8String.fromString(s)

  private def dirOf(rel: String): String = {
    val i = rel.lastIndexOf('/')
    if (i < 0) "" else rel.substring(0, i)
  }

  private def isDelete(rel: String): Boolean =
    ManifestTable.isDeleteEntry(rel)

  private def liveEntries(root: String): Seq[ManifestTable.FileEntry] =
    if (ManifestTable.exists(root)) ManifestTable.liveEntries(root) else Nil

  private def filesRows(root: String): Array[InternalRow] =
    liveEntries(root).map { e =>
      new GenericInternalRow(Array[Any](
        utf8(e.rel), utf8(dirOf(e.rel)),
        sizeOf(root, e),
        isDelete(e.rel),
        e.stats.map(utf8).orNull))
    }.toArray

  private def snapshotRows(root: String): Array[InternalRow] = {
    val live = if (ManifestTable.exists(root)) ManifestTable.currentVersion(root) else None
    (if (ManifestTable.exists(root)) ManifestTable.versions(root) else Nil).map { v =>
      val es = ManifestTable.entries(root, v)
      val (del, data) = es.partition(e => isDelete(e.rel))
      new GenericInternalRow(Array[Any](
        v,
        // commit instant = manifest mtime, in micros
        MetaIO.mtimeMillis(s"$root/manifests/v=$v.txt") * 1000L,
        // Iceberg's snapshot-summary operation field; null for manifests
        // committed before labels existed
        ManifestTable.manifestProps(root, v)
          .get(ManifestTable.OpProp).map(utf8).orNull,
        data.size.toLong, del.size.toLong,
        es.map(e => sizeOf(root, e)).sum,
        live.contains(v),
        ManifestTable.parentOf(root, v).map(Long.box).orNull,
        ManifestTable.ownerOf(root, v).map(utf8).orNull))
    }.toArray
  }

  /** The delete-backlog inspection surface (Iceberg's
    * `tbl.position_deletes`/delete-file listing, folded into one view):
    * one row per live delete file — kind, scoping sequence, size, and
    * (positional) the target-file list the entry rides. The row driving
    * `rewrite_deletes` sizing decisions. */
  private def deleteRows(root: String): Array[InternalRow] =
    liveEntries(root).filter(e => isDelete(e.rel)).map { e =>
      new GenericInternalRow(Array[Any](
        utf8(e.rel),
        utf8(if (ManifestTable.isEqDeleteEntry(e.rel)) "equality"
          else if (ManifestTable.isCdcEntry(e.rel)) "cdc" // feed sidecar, not backlog
          else "positional"),
        e.seq.getOrElse(0L),
        sizeOf(root, e),
        ManifestTable.deleteTouchedRels(e)
          .map(t => utf8(t.toSeq.sorted.mkString(","))).orNull))
    }.toArray

  /** Named refs (Iceberg's `tbl.refs`): one row per tag/branch with the
    * version it pins and whether that version is the live snapshot. */
  private def refRows(root: String): Array[InternalRow] = {
    val live = if (ManifestTable.exists(root)) ManifestTable.currentVersion(root) else None
    ManifestTable.refs(root).values.toSeq.sortBy(_.name).map { r =>
      new GenericInternalRow(Array[Any](
        utf8(r.name), utf8(r.kind), r.version, live.contains(r.version)))
    }.toArray
  }

  private def statsRows(root: String): Array[InternalRow] = {
    val meta = VersionedCatalog.readMeta(root).getOrElse(
      return Array.empty[InternalRow])
    val (delEntries, entries) = liveEntries(root).partition(e => isDelete(e.rel))
    val decoded = entries.map(e => FileStats.decode(e.stats.getOrElse("")))
    val tombstones = ColumnStatsReport.tombstonesOf(root, entries, decoded, delEntries)
    val totalRows = ColumnStatsReport.rowCountOf(decoded)
    val rows: Option[Long] = totalRows.map(r => math.max(0L, r - tombstones))
    // keep null_count consistent with the live n_rows (see
    // ColumnStatsReport.build — undeleted footer nulls scale uniformly)
    def scaleNulls(n: Long): Long = (totalRows, rows) match {
      case (Some(t), Some(l)) if tombstones > 0 && t > 0 =>
        math.min(l, math.round(n.toDouble * l / t))
      case _ => n
    }
    val resolved = (if (ManifestTable.exists(root))
        ManifestTable.currentVersion(root) else None)
      .flatMap(v => NdvStats.resolve(root, v))
    val ndv = resolved.map(_.sketches).getOrElse(Map.empty)
      .collect { case (k, v) if !k.endsWith(NdvStats.KllSuffix) =>
        k.toLowerCase -> NdvStats.estimate(v) }
    meta.schema.fields.flatMap { f =>
      FileStats.tagOf(f.dataType).map { tag =>
        val phys = meta.physicalName(f.name).toLowerCase
        val (mn, mx, nulls) = ColumnStatsReport.foldBounds(decoded, phys, tag)
        new GenericInternalRow(Array[Any](
          utf8(f.name),
          ndv.get(phys).filter(_ > 0L).map(Long.box).orNull,
          mn.map(utf8).orNull, mx.map(utf8).orNull,
          nulls.map(scaleNulls).map(Long.box).orNull,
          rows.map(Long.box).orNull,
          resolved.map(r => Long.box(r.version)).orNull,
          resolved.map(r => Boolean.box(r.stale)).orNull)): InternalRow
      }
    }
  }

  /** A file's byte size: off the manifest's `__bytes` when recorded (the
    * plan-from-manifest discipline — no per-file stat), else one FS stat
    * for pre-`__bytes` entries. Delete entries' stats fields carry other
    * payloads (DV indexes, target lists) and decode to empty — they fall
    * back too. */
  private def sizeOf(root: String, e: ManifestTable.FileEntry): Long =
    ManifestTable.entryBytes(root, e)

  private def partitionRows(root: String): Array[InternalRow] =
    liveEntries(root).filterNot(e => isDelete(e.rel))
      .groupBy(e => dirOf(e.rel)).toSeq.sortBy(_._1)
      .map { case (dir, es) =>
        new GenericInternalRow(Array[Any](
          utf8(dir), es.size.toLong,
          es.map(e => sizeOf(root, e)).sum))
      }.toArray
}

/** A metadata relation: rows recomputed from the manifest at every scan
  * build, served driver-locally. */
private[v2] case class MetaTable(tableName: String, tableSchema: StructType,
                                 rowsFn: () => Array[InternalRow])
    extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def properties(): JMap[String, String] =
    Map("provider" -> "versioned-metadata").asJava
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def rows(): Array[InternalRow] = rowsFn()
        override def readSchema(): StructType = tableSchema
        override def description(): String = tableName
      }
    }
}

package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.types.StructType

import graft.sources.{MetaIO, avro => gavro}

/** V2 batch scan over a [[graft.sources.ManifestTable]] whose data files
  * are Avro containers — the third leg of the catalog's per-table format
  * story. The MANIFEST is the file listing (day pruning already applied
  * by [[VersionedScanBuilder.prunedManifest]]), so no file index or
  * partition discovery is needed: files larger than the session's
  * `spark.sql.files.maxPartitionBytes` are SPLIT on Avro sync markers
  * (each task seeks to the first block boundary at/after its range start
  * and stops once past its range end — the same protocol as the
  * FileFormat leg), records are projected by PHYSICAL field name into
  * the required schema, and `readSchema` reports the LOGICAL names.
  * Filters are re-applied exactly by Spark post-scan (the builder
  * returns them all as residual), identical to the parquet/orc legs'
  * correctness contract — those legs additionally prune row groups,
  * which Avro containers don't have.
  *
  * Split planning stats the listed files once on the driver (one
  * metadata call per file — a HEAD on object stores; the manifest is
  * already the pruned listing, so this is bounded by the files the scan
  * will actually read). */
class AvroManifestScan(files: Seq[String], physicalRead: StructType,
                       logicalRead: StructType, maxSplitBytes: Long)
    extends Scan with Batch {

  override def readSchema(): StructType = logicalRead
  override def toBatch: Batch = this
  override def description(): String =
    s"AvroManifestScan[${files.size} files, ${logicalRead.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] =
    files.flatMap { f =>
      val len = MetaIO.size(f)
      val n = math.max(1L, math.ceil(len.toDouble / maxSplitBytes).toLong)
      val step = math.max(1L, len / n)
      (0L until n).map { i =>
        val start = i * step
        val end = if (i == n - 1) len else (i + 1) * step
        AvroFilePartition(f, start, end - start)
      }
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroManifestReaderFactory(physicalRead,
      new graft.sources.SerializableHadoopConf(
        org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))
}

case class AvroFilePartition(path: String, start: Long, length: Long)
    extends InputPartition

class AvroManifestReaderFactory(physicalRead: StructType,
                                confSer: graft.sources.SerializableHadoopConf)
    extends PartitionReaderFactory {

  // initial-defaults for columns absent from old files (EXISTS_DEFAULT
  // field metadata, internal representation) — all-null when no column
  // declares one; evaluated once per task, not per record
  @transient private lazy val existenceDefaults: Array[Any] = {
    val ds = org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
      .getExistenceDefaultValues(physicalRead)
    if (ds.forall(_ == null)) null else ds
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[AvroFilePartition]
    val path = new Path(p.path)
    // the SESSION conf rides to the task (s3a credentials, endpoints) —
    // same propagation contract as AvroFileFormat.buildReader
    val in = new org.apache.avro.mapred.FsInput(path, confSer.value)
    val reader = DataFileReader.openReader(
      in, new GenericDatumReader[GenericRecord]())
      .asInstanceOf[DataFileReader[GenericRecord]]
    reader.sync(p.start)
    val end = p.start + p.length
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean =
        if (reader.hasNext && !reader.pastSync(end)) {
          row = gavro.AvroConversions.toInternalRow(reader.next(), physicalRead,
            existenceDefaults)
          true
        } else false
      override def get(): InternalRow = row
      override def close(): Unit = reader.close()
    }
  }
}

package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.types.StructType

import graft.sources.avro.AvroConversions

/** V2 batch scan over a [[graft.sources.ManifestTable]] whose data files
  * are Avro containers — the third leg of the catalog's per-table format
  * story. The MANIFEST is the file listing (day pruning already applied
  * by [[VersionedScanBuilder.prunedManifest]]), so no file index or
  * partition discovery is needed: one input partition per container
  * file, records projected by PHYSICAL field name into the required
  * schema, `readSchema` reporting the LOGICAL names. Filters are
  * re-applied exactly by Spark post-scan (the builder returns them all
  * as residual), identical to the parquet/orc legs' correctness
  * contract — those legs additionally prune row groups, which Avro
  * containers don't have.
  *
  * Scale: file-granular parallelism matches the fan-out's ~128 MB file
  * targets; a stray multi-GB file is one task (same whole-file tradeoff
  * as [[graft.sources.avro.AvroFileFormat]], documented there). */
class AvroManifestScan(files: Seq[String], physicalRead: StructType,
                       logicalRead: StructType) extends Scan with Batch {

  override def readSchema(): StructType = logicalRead
  override def toBatch: Batch = this
  override def description(): String =
    s"AvroManifestScan[${files.size} files, ${logicalRead.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] =
    files.map(AvroFilePartition.apply).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroManifestReaderFactory(physicalRead)
}

case class AvroFilePartition(path: String) extends InputPartition

class AvroManifestReaderFactory(physicalRead: StructType)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = new Path(partition.asInstanceOf[AvroFilePartition].path)
    // fresh Configuration in-task, same as AvroFileFormat.buildReader:
    // file:// and default-FS reads need no session-specific settings
    val in = path.getFileSystem(new Configuration()).open(path)
    val stream = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean =
        if (stream.hasNext) {
          row = AvroConversions.toInternalRow(stream.next(), physicalRead)
          true
        } else false
      override def get(): InternalRow = row
      override def close(): Unit = stream.close()
    }
  }
}

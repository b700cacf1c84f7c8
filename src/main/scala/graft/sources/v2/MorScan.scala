package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types.StructType

/** Merge-on-read application of positional deletes in the V2 scan — the
  * read-side half of [[graft.sources.ManifestTable.appendDeletes]], doing
  * for the catalog what Iceberg's delete-file readers do for the
  * reference's tables:
  *
  *  - partitions of the delegate (parquet) scan are re-planned so every
  *    file CARRYING tombstones becomes one whole-file partition (row
  *    index = position in the reader's row stream, no split/row-group
  *    base arithmetic) while untouched files keep their original splits;
  *  - each affected partition's reader wraps the delegate's ROW-based
  *    reader and drops the tombstoned positions with a sorted-array
  *    pointer walk (O(1) amortized per row);
  *  - a scan with live tombstones runs wholly row-based (Spark refuses
  *    mixed columnar/row partitions in one scan) — the read-side price
  *    of merge-on-read, paid only until the next compaction returns the
  *    table to vectorized scans.
  *
  * Tombstone positions ship inside the reader factory, keyed by partition
  * index — bounded by the rows deleted since the last compaction (the
  * same working-set bound Iceberg's task-side delete loading has). */
class MorScan(delegate: Scan, deletesByRel: Map[String, Array[Long]])
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def readSchema(): StructType = delegate.readSchema()
  override def toBatch: Batch = this
  override def description(): String =
    s"Mor(${delegate.description()}, ${deletesByRel.size} tombstoned files)"
  // the delegate's size estimate is an upper bound (tombstoned rows are
  // still scanned, just dropped) — fine for join planning
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    GraftScanStats.of(delegate)

  private def relOf(path: String): String = {
    val i = path.lastIndexOf("/data/")
    if (i < 0) "" else path.substring(i + "/data/".length)
  }

  /** (partitions, partition index → sorted tombstone positions). */
  private lazy val planned: (Array[InputPartition], Map[Int, Array[Long]]) = {
    val out = Vector.newBuilder[InputPartition]
    val affected = Map.newBuilder[Int, Array[Long]]
    var idx = 0
    val wholeFilesEmitted = scala.collection.mutable.Set.empty[String]
    delegate.toBatch.planInputPartitions().foreach {
      case fp: FilePartition =>
        val (hit, clean) = fp.files.partition(f => deletesByRel.contains(relOf(f.urlEncodedPath)))
        if (clean.nonEmpty) { out += FilePartition(idx, clean); idx += 1 }
        hit.foreach { f =>
          val path = f.urlEncodedPath
          // a large file arrives as several splits: emit its whole-file
          // partition once (positions are file-absolute, so the reader
          // must see the file from row 0)
          if (!wholeFilesEmitted.contains(path)) {
            wholeFilesEmitted += path
            out += FilePartition(idx, Array(f.copy(start = 0, length = f.fileSize)))
            affected += idx -> deletesByRel(relOf(path))
            idx += 1
          }
        }
      case other => out += other; idx += 1 // defensive: pass through untouched
    }
    (out.result().toArray, affected.result())
  }

  override def planInputPartitions(): Array[InputPartition] = planned._1

  override def createReaderFactory(): PartitionReaderFactory =
    new MorReaderFactory(delegate.toBatch.createReaderFactory(), planned._2)

  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    Scan.ColumnarSupportMode.UNSUPPORTED
}

private[v2] class MorReaderFactory(delegate: PartitionReaderFactory,
                                   affected: Map[Int, Array[Long]])
    extends PartitionReaderFactory {

  private def tombstones(p: InputPartition): Option[Array[Long]] = p match {
    case fp: FilePartition => affected.get(fp.index)
    case _ => None
  }

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    delegate.createColumnarReader(p)

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val inner = delegate.createReader(p)
    tombstones(p) match {
      case None => inner
      case Some(positions) => new PartitionReader[InternalRow] {
        private var rowIdx = -1L
        private var skipPtr = 0
        override def next(): Boolean = {
          while (inner.next()) {
            rowIdx += 1
            while (skipPtr < positions.length && positions(skipPtr) < rowIdx) skipPtr += 1
            if (skipPtr >= positions.length || positions(skipPtr) != rowIdx) return true
          }
          false
        }
        override def get(): InternalRow = inner.get()
        override def close(): Unit = inner.close()
      }
    }
  }
}

package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types.{Decimal, StructType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarArray, ColumnarBatch, ColumnarMap}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.SerializableHadoopConf

/** Merge-on-read application of positional deletes in the V2 scan — the
  * read-side half of [[graft.sources.ManifestTable.appendDeletes]], doing
  * for the catalog what Iceberg's delete-file readers do for the
  * reference's tables:
  *
  *  - the driver ships only the SET of tombstoned file names (bounded by
  *    files touched since the last compaction) — each task loads its own
  *    file's positions from the snapshot's delete files with a pushed
  *    `__file = <rel>` parquet filter (delete files are written sorted by
  *    (`__file`, `__pos`), so row-group statistics skip everything else).
  *    Position lists NEVER materialize on the driver: a 100 TB table with
  *    a 10⁸-row delete backlog costs the plan one distinct-file-names
  *    job, not 10⁸ longs of driver heap;
  *  - partitions of the delegate (parquet) scan are re-planned so every
  *    file CARRYING tombstones becomes one whole-file partition (row
  *    index = position in the reader's stream, no split/row-group base
  *    arithmetic) while untouched files keep their original splits;
  *  - reads stay VECTORIZED: an affected partition's columnar reader maps
  *    surviving row ids through [[MaskedColumnVector]] (zero-copy — the
  *    Iceberg vectorized-delete shape); batches with no tombstones in
  *    range pass through untouched. Row-based readers drop positions with
  *    a sorted-array pointer walk, O(1) amortized per row.
  *
  * A tombstone-carrying scan still pushes NO data filters (row-group/page
  * skipping would desynchronize the file-absolute row index); Spark
  * applies every filter exactly post-scan, and the cost lasts only until
  * compaction materializes the deletes. */
class MorScan(delegate: Scan, affectedRels: Set[String],
              deleteFiles: Seq[String], conf: SerializableHadoopConf)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def readSchema(): StructType = delegate.readSchema()
  override def toBatch: Batch = this
  override def description(): String =
    s"Mor(${delegate.description()}, ${affectedRels.size} tombstoned files, task-side deletes)"
  // the delegate's size estimate is an upper bound (tombstoned rows are
  // still scanned, just dropped) — fine for join planning
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    GraftScanStats.of(delegate)

  private def relOf(path: String): String = {
    val i = path.lastIndexOf("/data/")
    if (i < 0) "" else path.substring(i + "/data/".length)
  }

  /** (partitions, partition index → tombstoned rel). */
  private lazy val planned: (Array[InputPartition], Map[Int, String]) = {
    val out = Vector.newBuilder[InputPartition]
    val affected = Map.newBuilder[Int, String]
    var idx = 0
    val wholeFilesEmitted = scala.collection.mutable.Set.empty[String]
    delegate.toBatch.planInputPartitions().foreach {
      case fp: FilePartition =>
        val (hit, clean) = fp.files.partition(f => affectedRels.contains(relOf(f.urlEncodedPath)))
        if (clean.nonEmpty) { out += FilePartition(idx, clean); idx += 1 }
        hit.foreach { f =>
          val path = f.urlEncodedPath
          // a large file arrives as several splits: emit its whole-file
          // partition once (positions are file-absolute, so the reader
          // must see the file from row 0)
          if (!wholeFilesEmitted.contains(path)) {
            wholeFilesEmitted += path
            out += FilePartition(idx, Array(f.copy(start = 0, length = f.fileSize)))
            affected += idx -> relOf(path)
            idx += 1
          }
        }
      case other => out += other; idx += 1 // defensive: pass through untouched
    }
    (out.result().toArray, affected.result())
  }

  override def planInputPartitions(): Array[InputPartition] = planned._1

  override def createReaderFactory(): PartitionReaderFactory =
    new MorReaderFactory(delegate.toBatch.createReaderFactory(), planned._2,
      deleteFiles, conf)

  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    delegate.columnarSupportMode()
}

/** Task-side tombstone loading: each reader pulls ITS file's positions
  * from the snapshot's delete files through parquet-hadoop with a pushed
  * `__file` equality filter — row groups whose (sorted) `__file` range
  * excludes the rel are skipped off their footer statistics. */
private[v2] object MorDeletes {
  def positionsFor(deleteFiles: Seq[String], rel: String,
                   conf: org.apache.hadoop.conf.Configuration): Array[Long] = {
    import org.apache.parquet.filter2.compat.FilterCompat
    import org.apache.parquet.filter2.predicate.FilterApi
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    import org.apache.parquet.io.api.Binary
    val filter = FilterCompat.get(FilterApi.eq(
      FilterApi.binaryColumn("__file"), Binary.fromString(rel)))
    val out = Array.newBuilder[Long]
    deleteFiles.foreach { f =>
      val reader = ParquetReader
        .builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(f))
        .withConf(conf).withFilter(filter).build()
      try {
        var g = reader.read()
        while (g != null) {
          out += g.getLong("__pos", 0)
          g = reader.read()
        }
      } finally reader.close()
    }
    val arr = out.result()
    java.util.Arrays.sort(arr)
    if (arr.length <= 1) arr
    else { // dedup: an UPDATE chain may re-tombstone a position across files
      val b = Array.newBuilder[Long]
      var last = arr(0) - 1
      arr.foreach { p => if (p != last) { b += p; last = p } }
      b.result()
    }
  }
}

private[v2] class MorReaderFactory(delegate: PartitionReaderFactory,
                                   affected: Map[Int, String],
                                   deleteFiles: Seq[String],
                                   conf: SerializableHadoopConf)
    extends PartitionReaderFactory {

  private def relFor(p: InputPartition): Option[String] = p match {
    case fp: FilePartition => affected.get(fp.index)
    case _ => None
  }

  override def supportColumnarReads(p: InputPartition): Boolean =
    delegate.supportColumnarReads(p)

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val inner = delegate.createColumnarReader(p)
    relFor(p) match {
      case None => inner
      case Some(rel) =>
        new MorColumnarReader(inner,
          MorDeletes.positionsFor(deleteFiles, rel, conf.value))
    }
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val inner = delegate.createReader(p)
    relFor(p) match {
      case None => inner
      case Some(rel) => new PartitionReader[InternalRow] {
        private lazy val positions =
          MorDeletes.positionsFor(deleteFiles, rel, conf.value)
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

/** Columnar tombstone application: batches overlapping no tombstone pass
  * through untouched; otherwise surviving row ids are mapped through a
  * zero-copy vector wrapper and the batch re-emitted with the kept count.
  * Fully-deleted batches are skipped. */
private[v2] class MorColumnarReader(inner: PartitionReader[ColumnarBatch],
                                    positions: Array[Long])
    extends PartitionReader[ColumnarBatch] {
  private var base = 0L   // file row index of the current batch's first row
  private var ptr = 0     // next tombstone not yet behind `base`
  private var current: ColumnarBatch = _

  override def next(): Boolean = {
    while (inner.next()) {
      val b = inner.get()
      val n = b.numRows()
      val start = ptr
      while (ptr < positions.length && positions(ptr) < base + n) ptr += 1
      val nDel = ptr - start
      if (nDel == 0) {
        current = b; base += n; return true
      }
      val kept = n - nDel
      if (kept > 0) {
        val rowMap = new Array[Int](kept)
        var i = 0; var o = 0; var d = start
        while (i < n) {
          if (d < ptr && positions(d) == base + i) d += 1
          else { rowMap(o) = i; o += 1 }
          i += 1
        }
        val cols = Array.tabulate(b.numCols())(c =>
          new MaskedColumnVector(b.column(c), rowMap): ColumnVector)
        current = new ColumnarBatch(cols, kept)
        base += n; return true
      }
      base += n // every row of this batch is tombstoned: skip it
    }
    false
  }

  override def get(): ColumnarBatch = current
  override def close(): Unit = inner.close()
}

/** Zero-copy surviving-row view over a delegate vector: accessor row ids
  * map through `rowMap` (kept-row → delegate-row). Struct children wrap
  * recursively (their accessors are row-indexed too); arrays/maps/strings
  * delegate at the mapped row and keep referencing the delegate's element
  * storage. null stats are the delegate's — an over-approximation, which
  * consumers treat as advisory. */
private[v2] class MaskedColumnVector(inner: ColumnVector, rowMap: Array[Int])
    extends ColumnVector(inner.dataType()) {
  override def close(): Unit = inner.close()
  // ColumnarToRowExec calls closeIfFreeable() on every CONSUMED batch; the
  // delegate (a reader-reused WritableColumnVector) no-ops it, and so must
  // the wrapper — the default would close() the reader's live vectors and
  // crash the next batch read
  override def closeIfFreeable(): Unit = inner.closeIfFreeable()
  override def hasNull: Boolean = inner.hasNull
  override def numNulls(): Int = inner.numNulls()
  override def isNullAt(i: Int): Boolean = inner.isNullAt(rowMap(i))
  override def getBoolean(i: Int): Boolean = inner.getBoolean(rowMap(i))
  override def getByte(i: Int): Byte = inner.getByte(rowMap(i))
  override def getShort(i: Int): Short = inner.getShort(rowMap(i))
  override def getInt(i: Int): Int = inner.getInt(rowMap(i))
  override def getLong(i: Int): Long = inner.getLong(rowMap(i))
  override def getFloat(i: Int): Float = inner.getFloat(rowMap(i))
  override def getDouble(i: Int): Double = inner.getDouble(rowMap(i))
  override def getArray(i: Int): ColumnarArray = inner.getArray(rowMap(i))
  override def getMap(i: Int): ColumnarMap = inner.getMap(rowMap(i))
  override def getDecimal(i: Int, precision: Int, scale: Int): Decimal =
    inner.getDecimal(rowMap(i), precision, scale)
  override def getUTF8String(i: Int): UTF8String = inner.getUTF8String(rowMap(i))
  override def getBinary(i: Int): Array[Byte] = inner.getBinary(rowMap(i))
  override def getChild(ordinal: Int): ColumnVector =
    new MaskedColumnVector(inner.getChild(ordinal), rowMap)
}

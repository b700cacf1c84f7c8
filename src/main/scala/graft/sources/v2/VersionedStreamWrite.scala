package graft.sources.v2

import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.v2.{GraftParquetWriterHandle, GraftStreamWriteBridge}
import org.apache.spark.sql.types.StructType

import graft.sources.{ManifestTable, MetaIO}

/** Native streaming writes into a versioned table
  * (`df.writeStream.toTable("cat.ns.t")` — the V2 STREAMING_WRITE leg):
  * each task streams its rows straight into a STAGED parquet file through
  * Spark's own parquet output writer (files identical to batch writes),
  * and the epoch COMMIT moves the staged files into the pool and
  * publishes ONE manifest append carrying the epoch marker
  * (`stream.<queryId>.epoch`) — a replayed epoch after driver recovery
  * is detected from the live manifest and its files are discarded
  * instead of double-appended, the same exactly-once contract the
  * foreachBatch sink keeps. Commit cost per epoch follows the epoch's
  * data; nothing rewrites.
  *
  * Complete output mode maps to an overwrite commit per epoch (the new
  * result set replaces the snapshot; retained history keeps earlier
  * epochs time-travelable).
  */
private[v2] class VersionedStreamWrite(root: String, fileSchema: StructType,
                                       queryId: String, overwrite: Boolean,
                                       retain: () => Int)
    extends StreamingWrite {

  private val stageDir =
    s"$root/stage/stream_${java.util.UUID.randomUUID().toString.take(12)}"

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    new VersionedStreamWriterFactory(
      GraftStreamWriteBridge.parquetWriterHandle(SparkSession.active, fileSchema),
      stageDir, fileSchema)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.collect { case StagedFile(Some(path)) => path }.toSeq
    val key = s"stream.$queryId.epoch"
    val last =
      if (ManifestTable.exists(root))
        ManifestTable.liveProps(root).get(key).map(_.toLong)
      else None
    if (last.exists(_ >= epochId)) {
      // replayed epoch: its rows are already committed — discard
      staged.foreach(MetaIO.delete(_))
    } else if (staged.isEmpty && !overwrite) {
      // empty append epoch: advance the marker when a manifest exists (an
      // empty manifest is unrepresentable, so a brand-new table waits)
      if (ManifestTable.exists(root))
        ManifestTable.commitStagedFiles(root, Nil, fileSchema,
          retain(), overwrite = false, Map(key -> epochId.toString))
    } else {
      ManifestTable.commitStagedFiles(root, staged, fileSchema,
        retain(), overwrite, Map(key -> epochId.toString))
    }
    MetaIO.delete(stageDir, recursive = true)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case StagedFile(Some(path)) => MetaIO.delete(path)
      case _ => ()
    }
    MetaIO.delete(stageDir, recursive = true)
  }
}

private case class StagedFile(path: Option[String]) extends WriterCommitMessage

private class VersionedStreamWriterFactory(handle: GraftParquetWriterHandle,
                                           stageDir: String, schema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // lazy open: an empty task stages no file at all
      private var writer: org.apache.spark.sql.execution.datasources.v2.GraftRowFileWriter = _
      private var path: String = _
      override def write(row: InternalRow): Unit = {
        if (writer == null) {
          val ctx = new TaskAttemptContextImpl(handle.conf.value,
            new TaskAttemptID(new TaskID(new JobID(
              "graftstream", (epochId % Int.MaxValue).toInt), TaskType.MAP, partitionId),
              (taskId % Int.MaxValue).toInt))
          path = s"$stageDir/e${epochId}_p${partitionId}_t$taskId" +
            handle.extension(ctx)
          writer = handle.open(path, schema, ctx)
        }
        writer.write(row)
      }
      override def commit(): WriterCommitMessage = {
        if (writer != null) writer.close()
        StagedFile(Option(path))
      }
      override def abort(): Unit = {
        if (writer != null) writer.close()
        if (path != null) MetaIO.delete(path)
      }
      override def close(): Unit = ()
    }
}

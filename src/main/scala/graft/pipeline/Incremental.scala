package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.{Dsl, Tables}

/** Incremental view maintenance — the gold-refresh step that makes a
  * medallion pipeline cheap to re-run: instead of recomputing an
  * aggregate table from the full fact history on every cron tick (what
  * the reference's gold DAG does,
  * `/root/reference/dags/3_silver_to_gold.py`), keep the materialized
  * PARTIAL STATE (exact-decimal sums + counts per group) and fold in
  * only the delta since the last refresh.
  *
  * The combine is a union of two partial-aggregate frames followed by a
  * re-aggregation on the group key — the same merge an
  * `Aggregator.merge` performs, expressed relationally so Catalyst
  * map-side-combines it. Sums and counts are decomposable; derived
  * ratios (avg) are re-derived from the combined sums, never averaged
  * across partials. At 100 TB this turns a full-history shuffle into a
  * delta-sized one: the state side is group-cardinality rows (read back
  * from the materialized table), the delta side scans only new
  * partitions (here the watermark predicate; in production the
  * ingestion-date partition prune).
  */
object Incremental {

  /** Refresh watermark splitting "materialized history" from "new
    * arrivals" (the last ~5 days of the 30-day event window). */
  val Cutoff = "2024-01-25 00:00:00"

  /** Per-(user, event_type) spend rollup maintained incrementally:
    * partials below/at-or-after the watermark are combined and must
    * equal the full recompute (which is exactly what the oracle runs).
    * `n_delta` audits how much of each group's mass arrived in the
    * delta — the refresh-cost meter. */
  def incrementalAggRefresh(spark: SparkSession, dir: String,
                            cutoff: String = Cutoff): DataFrame = {
    val events = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("value"))

    def partial(df: DataFrame, isDelta: Boolean): DataFrame =
      df.groupBy(col("user_id"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          Dsl.dsumDec(col("value")).as("sum_dec"),
          (if (isDelta) count(lit(1)) else lit(0L)).as("n_delta"))

    val state = partial(events.where(col("ts") < lit(cutoff).cast("timestamp_ntz")), isDelta = false)
    val delta = partial(events.where(col("ts") >= lit(cutoff).cast("timestamp_ntz")), isDelta = true)

    state.unionByName(delta)
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        sum(col("n")).as("n_events"),
        sum(col("sum_dec")).cast(DoubleType).as("total_value"),
        sum(col("n_delta")).as("n_delta"))
      .withColumn("avg_value",
        col("total_value") / col("n_events"))
  }

  object oracle {
    /** Full recompute — incremental maintenance must be invisible in the
      * result; `n_delta` is re-derived from the same watermark. */
    val incrementalAggRefresh: String =
      s"""SELECT user_id, event_type,
         |  COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS total_value,
         |  CAST(SUM(CASE WHEN ts >= TIMESTAMP '${Incremental.Cutoff}' THEN 1 ELSE 0 END) AS BIGINT) AS n_delta,
         |  ${Dsl.sql.dsum("value")} / COUNT(*) AS avg_value
         |FROM events GROUP BY 1, 2""".stripMargin
  }
}

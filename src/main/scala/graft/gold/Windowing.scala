package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Dsl, Tables}

/** Analytic-window / set-operation / pivot / time-bucket surface — beyond
  * the reference's two ROW_NUMBER calls, the rest of what an analytics
  * engine's users expect. All DuckDB-oracle-backed.
  *
  * Scale notes: every window here partitions by user_id (bounded state per
  * key, parallel across keys — never a global window over facts); the
  * pivot has a fixed small column set (no runtime distinct scan); tumbling
  * windows are a plain hash agg on a derived bucket key.
  */
object Windowing {

  /** LAG/LEAD/running-sum per user ordered by (ts, event_id) — exact
    * decimal running sum so the frame-by-frame accumulation is
    * bit-reproducible. */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("running_value",
        sum(Dsl.money(col("value")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType))
  }

  /** Ranking-function breadth per user: rank/dense_rank over the value
    * ordering (ties allowed), percent_rank (exact int-ratio double —
    * bit-stable cross-engine), ntile quartiles and a first_value /
    * sliding-rows-frame sum over the fully tie-broken ordering. */
  def windowRankStats(spark: SparkSession, dir: String): DataFrame = {
    val byValue = Window.partitionBy(col("user_id")).orderBy(col("value"))
    val total   = Window.partitionBy(col("user_id")).orderBy(col("value"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
      .withColumn("rk", rank().over(byValue))
      .withColumn("drk", dense_rank().over(byValue))
      .withColumn("prk", percent_rank().over(byValue))
      .withColumn("quartile", ntile(4).over(total))
      .withColumn("first_val", first(col("value")).over(
        total.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("window_sum",
        sum(Dsl.money(col("value")))
          .over(total.rowsBetween(-2, 2)).cast(DoubleType))
  }

  /** INTERSECT / EXCEPT / UNION over user sets (SURVEY §2.7 notes the
    * reference has none — the engine still provides them). */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    def users(t: String) = e.where(col("event_type") === t).select(col("user_id"))
    val both    = users("purchase").intersect(users("error"))
      .withColumn("tag", lit("purchase_and_error"))
    val only    = users("purchase").except(users("signup"))
      .withColumn("tag", lit("purchase_no_signup"))
    both.unionByName(only).select(col("tag"), col("user_id"))
  }

  private val pivotTypes = Seq("click", "view", "purchase", "signup", "error")

  /** Pivot per-user volumes by event type (fixed column set — a runtime
    * distinct scan would be an extra pass at scale). */
  def pivotUserType(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", pivotTypes)
      .agg(sum(Dsl.money(col("value"))).cast(DoubleType))

  /** 6-hour tumbling windows over the event stream (batch form of the
    * streaming windowed aggregate). */
  /** RANGE-frame window over event time: per user, the rolling 1-hour
    * spend (`RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW`) —
    * the value-based frame the ROWS-frame queries above can't express
    * (frame membership follows the ORDER BY VALUE, so timestamp ties are
    * peers and engines agree regardless of tie order). The rate-limiting /
    * rolling-exposure shape. Same scale contract as every per-key window:
    * one shuffle on user_id, state bounded by a key's rows inside the
    * interval. Exact-decimal sum keeps the rolling total bit-comparable. */
  def windowRangeFrame(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .selectExpr(
        "event_id", "user_id", "ts", "value",
        """CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
          |  PARTITION BY user_id ORDER BY ts
          |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
          |) AS DOUBLE) AS vol_1h""".stripMargin,
        """CAST(COUNT(*) OVER (
          |  PARTITION BY user_id ORDER BY ts
          |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
          |) AS BIGINT) AS n_1h""".stripMargin)

  def tumblingVolume(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "6 hours"))
      .agg(
        count(lit(1)).as("n_events"),
        Dsl.dsum(col("value")).as("volume"),
        countDistinct(col("user_id")).as("users"))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("n_events"), col("volume"), col("users"))

  object oracle {
    val windowRunning: String =
      s"""SELECT event_id, user_id, ts, value, event_type,
         |  CAST(ROW_NUMBER() OVER w AS INT) AS rn,
         |  LAG(value, 1) OVER w AS prev_value,
         |  LEAD(event_type, 1) OVER w AS next_type,
         |  CAST(SUM(CAST(value AS DECIMAL(18,6)))
         |    OVER (PARTITION BY user_id ORDER BY ts, event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin

    val windowRankStats: String =
      s"""SELECT event_id, user_id, value,
         |  CAST(RANK() OVER v AS INT) AS rk,
         |  CAST(DENSE_RANK() OVER v AS INT) AS drk,
         |  PERCENT_RANK() OVER v AS prk,
         |  CAST(NTILE(4) OVER t AS INT) AS quartile,
         |  FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY value, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_val,
         |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
         |    PARTITION BY user_id ORDER BY value, event_id
         |    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS DOUBLE) AS window_sum
         |FROM events
         |WINDOW v AS (PARTITION BY user_id ORDER BY value),
         |       t AS (PARTITION BY user_id ORDER BY value, event_id)""".stripMargin

    val setOps: String =
      s"""SELECT 'purchase_and_error' AS tag, user_id FROM (
         |  SELECT user_id FROM events WHERE event_type = 'purchase'
         |  INTERSECT
         |  SELECT user_id FROM events WHERE event_type = 'error')
         |UNION ALL
         |SELECT 'purchase_no_signup' AS tag, user_id FROM (
         |  SELECT user_id FROM events WHERE event_type = 'purchase'
         |  EXCEPT
         |  SELECT user_id FROM events WHERE event_type = 'signup')""".stripMargin

    val pivotUserType: String = {
      val cols = pivotTypes.map(t =>
        s"CAST(SUM(CAST(CASE WHEN event_type = '$t' THEN value END AS DECIMAL(18,6))) AS DOUBLE) AS $t")
        .mkString(",\n  ")
      s"""SELECT user_id,
         |  $cols
         |FROM events GROUP BY 1""".stripMargin
    }

    val windowRangeFrame: String =
      """SELECT event_id, user_id, ts, value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS vol_1h,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""".stripMargin

    val tumblingVolume: String =
      s"""SELECT
         |  make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) * 1000000) AS ws,
         |  make_timestamp((CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) + 21600) * 1000000) AS we,
         |  COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume,
         |  COUNT(DISTINCT user_id) AS users
         |FROM events GROUP BY 1, 2""".stripMargin
  }
}

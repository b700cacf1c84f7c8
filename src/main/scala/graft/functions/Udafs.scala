package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

import graft.Tables

/** Custom typed `Aggregator` (UDAF) surface — the one Spark extension
  * point the reference never needed (SURVEY §2.10) but a real engine
  * exposes: a single-pass spend-stats aggregate (count / exact sum /
  * min / max) registered through `functions.udaf`.
  *
  * Exactness contract: the sum accumulates micro-units (the input scaled
  * to 6 decimals via BigDecimal HALF_UP — the same rounding as
  * `CAST(x AS DECIMAL(18,6))`) in a Long, so merging is associative and
  * the final double equals the engine-wide `Dsl.dsum` / oracle
  * `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)` bit-for-bit.
  * Long capacity: |value| <= ~1e5 at 1e6 scale over ~1e9 rows stays
  * under 2^63; beyond that the buffer widens to two Longs (hi/lo).
  */
object Udafs {

  case class SpendBuf(n: Long, sumMicros: Long, mn: Double, mx: Double)
  case class SpendOut(n_values: Long, total: Double, min_value: Double, max_value: Double)

  object SpendStats extends Aggregator[Double, SpendBuf, SpendOut] {
    private def micros(v: Double): Long =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .underlying.unscaledValue.longValueExact

    def zero: SpendBuf = SpendBuf(0L, 0L, Double.PositiveInfinity, Double.NegativeInfinity)
    def reduce(b: SpendBuf, v: Double): SpendBuf =
      SpendBuf(b.n + 1, b.sumMicros + micros(v), math.min(b.mn, v), math.max(b.mx, v))
    def merge(a: SpendBuf, b: SpendBuf): SpendBuf =
      SpendBuf(a.n + b.n, a.sumMicros + b.sumMicros, math.min(a.mn, b.mn), math.max(a.mx, b.mx))
    def finish(b: SpendBuf): SpendOut =
      if (b.n == 0) SpendOut(0L, 0.0, Double.NaN, Double.NaN)
      else SpendOut(b.n, java.math.BigDecimal.valueOf(b.sumMicros, 6).doubleValue, b.mn, b.mx)
    def bufferEncoder: Encoder[SpendBuf] = Encoders.product[SpendBuf]
    def outputEncoder: Encoder[SpendOut] = Encoders.product[SpendOut]
  }

  /** Per-event-type spend stats through the custom UDAF. */
  def udafSpendStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(udaf(SpendStats).apply(col("value")).as("stats"))
      .select(col("event_type"),
        col("stats.n_values").as("n_values"),
        col("stats.total").as("total"),
        col("stats.min_value").as("min_value"),
        col("stats.max_value").as("max_value"))

  object oracle {
    val udafSpendStats: String =
      s"""SELECT event_type,
         |  COUNT(value) AS n_values,
         |  ${graft.Dsl.sql.dsum("value")} AS total,
         |  MIN(value) AS min_value,
         |  MAX(value) AS max_value
         |FROM events GROUP BY 1""".stripMargin
  }
}

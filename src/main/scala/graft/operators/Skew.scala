package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Dsl, Tables}
import graft.Dsl._

/** Skew-handling and approximate-aggregation operators — the knobs that
  * matter at 100 TB but are invisible at test scale.
  */
object Skew {

  /** Salted equi-join for skewed keys: the skewed (large) side gets a
    * random-but-deterministic salt in [0, factor); the build side is
    * replicated across all salt values; the join key becomes
    * (key, salt), splitting each hot key's rows over `factor` reducers.
    *
    * AQE's skew-join split handles most cases automatically; explicit
    * salting remains the tool when a single key exceeds what one task can
    * hold even after AQE splits (e.g. a null-key flood), or when the
    * shuffle layout must be controlled for a downstream stage. Salt is
    * derived from a row hash, not rand(), so replays/retries are stable.
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, keys: Seq[String],
                 factor: Int = 8, joinType: String = "inner"): DataFrame = {
    val salted = skewed.withColumn("__salt",
      pmod(hash(skewed.columns.toIndexedSeq.map(col): _*), lit(factor)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Approximate distinct counts + quantiles over lineitem — the sketch
    * path (HLL++ / KLL) that replaces exact countDistinct at scale.
    * Deterministic for fixed input, but sketch internals differ per
    * engine, so this op carries unit-spec error bounds instead of a SQL
    * oracle. */
  def approxMetrics(spark: SparkSession, dir: String, rsd: Double = 0.05): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        // quantile sketch over a deterministic ~5% hash-sample: the
        // percentile summary's per-row update is the dominant cost
        // (measured 14µs/row interpreted at accuracy 1000), and sampling
        // before sketching is the standard scale move — hash-derived so
        // reruns are stable, ONE sketch for both quantiles
        percentile_approx(
          when(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(100)) < 5,
            col("l_extendedprice")),
          array(lit(0.5), lit(0.99)), lit(1000))
          .as("price_quantiles"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("approx_orders"), col("exact_orders"),
        col("price_quantiles").getItem(0).as("approx_median_price"),
        col("price_quantiles").getItem(1).as("approx_p99_price"),
        col("n"))
}

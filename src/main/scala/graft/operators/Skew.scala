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
    *
    * Sketch values are engine-specific, so the comparable output is the
    * ERROR-BOUND VERDICT, not the raw estimate: each boolean asserts the
    * sketch honored its published bound against an exact computation of
    * the same quantity, and the oracle emits literal TRUE. A sketch
    * regression (or a broken bound) flips the boolean and fails the hash
    * compare — the approximate path is oracle-gated without requiring
    * cross-engine sketch bit-parity.
    *
    * Plan shape matters here: mixing countDistinct with object-buffer
    * aggregates (HLL, percentile) in ONE agg forces the
    * expand + multi-stage distinct plan with sketch buffers riding every
    * stage (measured 2.9 s warm at sf0.1 vs 1.5 s for the parts). Split
    * instead: sketch-only agg (single-stage ObjectHashAggregate), then a
    * broadcast join of the 3 sketch rows back onto the scan for the exact
    * counts + rank verification — two cheap scans, no expand over buffers.
    */
  def approxMetrics(spark: SparkSession, dir: String, rsd: Double = 0.05): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    // deterministic ~5% hash-sample feeding the quantile sketch: the
    // percentile summary's per-row update dominates at full density, and
    // sampling before sketching is the standard scale move — hash-derived
    // so reruns/retries are stable; ONE sketch serves both quantiles
    val sampled = when(
      pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(100)) < 5,
      col("l_extendedprice"))
    val sketches = li
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd).as("approx_orders"),
        percentile_approx(sampled, array(lit(0.5), lit(0.99)), lit(1000)).as("pq"))
      .select(col("l_returnflag"), col("approx_orders"),
        col("pq").getItem(0).as("am"), col("pq").getItem(1).as("ap99"))

    li.join(broadcast(sketches), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        count(lit(1)).as("n"),
        max(col("approx_orders")).as("approx_orders"),
        // rank positions of the sketch outputs within the same sample the
        // sketch saw (percentile_approx guarantees rank error <= 1/accuracy
        // on its input; bounds below add slack for value ties)
        sum(when(sampled <= col("am"), 1).otherwise(0)).as("le_med"),
        sum(when(sampled <= col("ap99"), 1).otherwise(0)).as("le_p99"),
        count(sampled).as("n_sample"))
      .select(
        col("l_returnflag"),
        (abs(col("approx_orders") - col("exact_orders"))
          <= lit(3 * rsd) * col("exact_orders")).as("hll_ok"),
        (col("le_med") / col("n_sample")).between(0.45, 0.55).as("median_rank_ok"),
        (col("le_p99") / col("n_sample")).between(0.97, 1.0).as("p99_rank_ok"),
        col("exact_orders"), col("n"))
  }

  object oracle {
    /** The exact quantities are recomputed independently; the bound
      * verdicts are literal TRUE — Spark failing a bound flips its boolean
      * and fails the hash compare. */
    val approxMetrics: String =
      s"""SELECT l_returnflag,
         |  TRUE AS hll_ok, TRUE AS median_rank_ok, TRUE AS p99_rank_ok,
         |  COUNT(DISTINCT l_orderkey) AS exact_orders, COUNT(*) AS n
         |FROM lineitem GROUP BY 1""".stripMargin
  }
}

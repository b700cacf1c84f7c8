package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables

/** Data-quality profiling operators — the audit passes a pipeline runs
  * before trusting a new batch: per-column completeness/cardinality and
  * per-key skew diagnosis (the input to the salting / AQE-skew decisions
  * in [[Skew]]).
  */
object Profile {

  /** Per-column profile of `orders`: row count, null count, null rate,
    * exact distinct count — one row per column (unpivoted via `stack` so
    * the table scans ONCE; the multi-column exact distincts share a
    * single expand). At 100 TB swap the exact distincts for
    * `approx_count_distinct` (the sketch path [[Skew.approxMetrics]]
    * oracle-gates) — the plan shape is otherwise identical. */
  def tableProfile(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap { c =>
        Seq(count(col(c)).as(s"${c}__nn"),
          countDistinct(col(c)).as(s"${c}__nd"))
      }
    val wide = Tables.orders(spark, dir).agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c => s"'$c', ${c}__nn, ${c}__nd").mkString(", ")
    wide.select(col("n_rows"),
        expr(s"stack(${cols.size}, $stacked) as (column_name, n_non_null, n_distinct)"))
      .select(
        col("column_name"),
        col("n_rows"),
        (col("n_rows") - col("n_non_null")).as("n_null"),
        ((col("n_rows") - col("n_non_null")).cast(DoubleType) / col("n_rows")).as("null_rate"),
        col("n_distinct"))
  }

  /** The 100 TB variant of [[tableProfile]]: per-column cardinality via
    * `approx_count_distinct` (HLL++), oracle-gated through error-bound
    * verdicts like [[Skew.approxMetrics]] — `approx_ok` asserts the
    * sketch honored 3× its published rsd against the exact count and the
    * oracle pins it TRUE, so a sketch regression fails the hash compare.
    *
    * Plan shape: the sketch pass and the exact pass run as SEPARATE
    * single-row aggregates joined by cross product (one row each side) —
    * mixing countDistinct with HLL buffers in one agg forces the expand
    * plan with sketch state riding every stage (the same split
    * [[Skew.approxMetrics]] measures). At production scale the exact side
    * is dropped and the sketch side IS the profile — the plan shape stays
    * identical. */
  def approxTableProfile(spark: SparkSession, dir: String, rsd: Double = 0.05): DataFrame = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val orders = Tables.orders(spark, dir)
    val exactAggs = count(lit(1)).as("n_rows") +:
      cols.flatMap { c =>
        Seq(count(col(c)).as(s"${c}__nn"), countDistinct(col(c)).as(s"${c}__nd"))
      }
    val approxAggs = cols.map(c => approx_count_distinct(col(c), rsd).as(s"${c}__ad"))
    val exact = orders.agg(exactAggs.head, exactAggs.tail: _*)
    val approx = orders.agg(approxAggs.head, approxAggs.tail: _*)
    val stacked = cols.map(c => s"'$c', ${c}__nn, ${c}__nd, ${c}__ad").mkString(", ")
    exact.crossJoin(approx)
      .select(col("n_rows"),
        expr(s"stack(${cols.size}, $stacked) as (column_name, n_non_null, n_distinct, approx_distinct)"))
      .select(
        col("column_name"),
        col("n_rows"),
        (col("n_rows") - col("n_non_null")).as("n_null"),
        ((col("n_rows") - col("n_non_null")).cast(DoubleType) / col("n_rows")).as("null_rate"),
        col("n_distinct"),
        (abs(col("approx_distinct") - col("n_distinct"))
          <= lit(3 * rsd) * col("n_distinct")).as("approx_ok"))
  }

  /** Key-skew diagnosis for an equi-join/groupBy key: row count per key
    * rolled up to distribution stats — key cardinality, max/avg rows per
    * key, the skew ratio that decides whether a plain shuffle is safe,
    * and the heaviest key itself (deterministic: max by (count, key)).
    * Two hash aggregates, both map-side combinable; the second runs over
    * one row per key. */
  def skewProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey").as("key"))
      .agg(count(lit(1)).as("cnt"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_rows_per_key"),
        (sum(col("cnt")).cast(DoubleType) / count(lit(1))).as("avg_rows_per_key"),
        max_by(col("key"), struct(col("cnt"), col("key"))).as("heaviest_key"))
      .withColumn("skew_ratio",
        col("max_rows_per_key").cast(DoubleType) / col("avg_rows_per_key"))

  object oracle {
    val tableProfile: String = {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      cols.map { c =>
        s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
           |  COUNT(*) - COUNT($c) AS n_null,
           |  CAST(COUNT(*) - COUNT($c) AS DOUBLE) / COUNT(*) AS null_rate,
           |  COUNT(DISTINCT $c) AS n_distinct
           |FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n")
    }

    /** Exact quantities recomputed independently; the sketch-bound verdict
      * is literal TRUE (same contract as [[Skew.oracle.approxMetrics]]). */
    val approxTableProfile: String = {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      cols.map { c =>
        s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
           |  COUNT(*) - COUNT($c) AS n_null,
           |  CAST(COUNT(*) - COUNT($c) AS DOUBLE) / COUNT(*) AS null_rate,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  TRUE AS approx_ok
           |FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n")
    }

    val skewProfile: String =
      """WITH c AS (
        |  SELECT l_suppkey AS key, COUNT(*) AS cnt FROM lineitem GROUP BY 1)
        |SELECT COUNT(*) AS n_keys,
        |  CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |  MAX(cnt) AS max_rows_per_key,
        |  CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS avg_rows_per_key,
        |  (SELECT key FROM c
        |   WHERE cnt = (SELECT MAX(cnt) FROM c) ORDER BY key DESC LIMIT 1)
        |    AS heaviest_key,
        |  CAST(MAX(cnt) AS DOUBLE) / (CAST(SUM(cnt) AS DOUBLE) / COUNT(*))
        |    AS skew_ratio
        |FROM c""".stripMargin
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gold.{Tpch, Windowing}
import graft.functions.{Text, Udafs}

/** Structural assertions for the round-2 coverage queries (the value-level
  * check is the DuckDB oracle; these pin the semantic invariants). */
class CoverageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("driver contract: queries and oracleSql cover exactly the same names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q diff o).isEmpty,
      s"queries without an oracle (driver records only a weak rows check): ${(q diff o).mkString(", ")}")
    assert((o diff q).isEmpty,
      s"orphan oracle entries (driver would ERROR on the missing parquet): ${(o diff q).mkString(", ")}")
  }

  test("cube_volume: all four grouping combinations present, totals consistent") {
    val df = Tpch.cubeVolume(spark, sf).cache()
    assert(df.select(col("g_status"), col("g_prio")).distinct().count() === 4)
    val grand = df.where(col("g_status") === 1 && col("g_prio") === 1)
    assert(grand.count() === 1)
    val total  = grand.first().getAs[Long]("n_orders")
    val leaves = df.where(col("g_status") === 0 && col("g_prio") === 0)
      .agg(sum(col("n_orders"))).first().getLong(0)
    assert(total === leaves)
  }

  test("range_join_promo: every matched item inside its window") {
    val df = Tpch.rangeJoinPromo(spark, sf)
    assert(df.count() === 8)
    assert(df.where(col("n_items") <= 0).count() === 0)
  }

  test("q22: dormant-wealthy cohort is non-empty and balances above average") {
    val df = Tpch.q22WealthyInactive(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.where(col("n_customers") <= 0).count() === 0)
  }

  test("window_rank_stats: percent_rank in [0,1], ntile in 1..4, rank >= dense_rank") {
    val df = Windowing.windowRankStats(spark, sf).cache()
    assert(df.where(col("prk") < 0 || col("prk") > 1).count() === 0)
    assert(df.where(col("quartile") < 1 || col("quartile") > 4).count() === 0)
    assert(df.where(col("rk") < col("drk")).count() === 0)
  }

  test("udaf_spend_stats matches built-in aggregates") {
    val udafDf = Udafs.udafSpendStats(spark, sf)
    val ref = Tables.events(spark, sf).groupBy(col("event_type")).agg(
      count(col("value")).as("n_values"),
      Dsl.dsum(col("value")).as("total"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value"))
    assert(udafDf.exceptAll(ref).count() === 0)
    assert(ref.exceptAll(udafDf).count() === 0)
  }

  test("token_count: word counts bounded by whitespace tokens, mean length positive") {
    val df = Text.tokenCount(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.where(col("n_words") > 0 && col("mean_word_len") <= 0).count() === 0)
    assert(df.where(col("n_alpha_chars") < col("n_words")).count() === 0)
  }
}

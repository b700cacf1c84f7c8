package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gold.{Analytics, Tpch}

class GoldAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("monthly_balance: saldo invariant and non-empty") {
    val df = Analytics.monthlyBalance(spark, sf).cache()
    assert(df.count() > 0)
    // entradas - saidas == saldo_liquido holds by construction (A1)
    val bad = df.where(
      abs(col("entradas") - col("saidas") - col("saldo_liquido")) > 1e-6).count()
    assert(bad === 0)
    // conditional maxima bounded by totals
    assert(df.where(col("maior_entrada") > col("entradas") + 1e-6).count() === 0)
  }

  test("customer_summary: every customer present exactly once, null-safe zeros") {
    val df = Analytics.customerSummary(spark, sf).cache()
    val customers = Tables.customer(spark, sf).count()
    assert(df.count() === customers)
    assert(df.select(countDistinct(col("customer_id"))).first().getLong(0) === customers)
    // customers with no orders must have zeroed aggregates, not nulls
    assert(df.where(col("total_contratos").isNull || col("saldo_total").isNull).count() === 0)
    // produtos_utilizados csv is sorted (determinism contract)
    val unsorted = df.where(
      split(col("produtos_utilizados"), ",") =!=
        array_sort(split(col("produtos_utilizados"), ","))).count()
    assert(unsorted === 0)
  }

  test("daily_metrics: stddev null iff single-row group, min<=avg<=max") {
    val df = Analytics.dailyMetrics(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.where(col("quantidade_transacoes") > 1 && col("desvio_padrao").isNull).count() === 0)
    assert(df.where(col("quantidade_transacoes") === 1 && col("desvio_padrao").isNotNull).count() === 0)
    assert(df.where(col("valor_medio") < col("valor_minimo") - 1e-6
      || col("valor_medio") > col("valor_maximo") + 1e-6).count() === 0)
  }

  test("product_ranking: ranks are a 1..n permutation") {
    val df = Analytics.productRanking(spark, sf).cache()
    val n = df.count()
    assert(n > 0)
    assert(df.select(min(col("rank_volume"))).first().getInt(0) === 1)
    assert(df.select(max(col("rank_volume"))).first().getInt(0).toLong === n)
    assert(df.select(countDistinct(col("rank_volume"))).first().getLong(0) === n)
    assert(df.select(countDistinct(col("rank_transacoes"))).first().getLong(0) === n)
  }

  test("q1: six flag/status groups; q3: at most 10 ranked rows") {
    assert(Tpch.q1PricingSummary(spark, sf).count() <= 6)
    val q3 = Tpch.q3ShippingPriority(spark, sf).cache()
    assert(q3.count() <= 10 && q3.count() > 0)
    assert(q3.select(max(col("rk"))).first().getInt(0).toLong === q3.count())
  }
}

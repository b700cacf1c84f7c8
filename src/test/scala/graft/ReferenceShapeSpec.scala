package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.bronze.Generate

/** Fidelity checks for the reference-shaped generator (SURVEY §2.3
  * distributions) and the verbatim reference gold query over it. */
class ReferenceShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val types = Generate.dTransactionTypes(spark).cache()
  private lazy val txns  = Generate.fTransactions(spark, 5000, nContracts = 500).cache()

  test("generation is deterministic and fully keyed") {
    val again = Generate.fTransactions(spark, 5000, nContracts = 500)
    assert(txns.collect().toSet === again.collect().toSet)
    assert(txns.select(countDistinct(col("transaction_id"))).first().getLong(0) === 5000L)
    // FK domains hold
    assert(txns.join(types, Seq("transaction_type_id"), "left_anti").count() === 0)
    assert(txns.where(col("contract_id") < 0 || col("contract_id") >= 500).count() === 0)
  }

  test("amounts: outflow types strictly negative, inflow positive, 2-dp rounded") {
    val joined = txns.join(types, Seq("transaction_type_id"))
    val outflow = Seq("PIX_OUT", "TED_SENT", "CREDIT_PURCHASE_BUY", "BILL_PAYMENT", "FEE_PAYMENT")
    assert(joined.where(col("transaction_type_name").isin(outflow: _*) && col("amount") >= 0).count() === 0)
    assert(joined.where(!col("transaction_type_name").isin(outflow: _*) && col("amount") <= 0).count() === 0)
    // LOAN range 1000..50000 (reference `:450-459`)
    val loans = joined.where(col("transaction_type_name") === "LOAN_DISBURSEMENT")
    assert(loans.where(col("amount") < 1000.0 || col("amount") > 50000.0).count() === 0)
  }

  test("weighted statuses approximate the 85/8/5/2 reference mix") {
    val frac = txns.where(col("transaction_status") === "COMPLETED").count().toDouble / 5000
    assert(frac > 0.80 && frac < 0.90, s"COMPLETED fraction $frac")
    val contracts = Generate.fContracts(spark, 2000, nCustomers = 300).cache()
    val active = contracts.where(col("contract_status") === "ACTIVE").count().toDouble / 2000
    assert(active > 0.65 && active < 0.75, s"ACTIVE fraction $active")
    val withEnd = contracts.where(col("end_date").isNotNull).count().toDouble / 2000
    assert(withEnd > 0.05 && withEnd < 0.15, s"end_date fraction $withEnd")
  }

  test("completed_at is 1..300 s after requested_at") {
    val bad = txns.where(
      col("completed_at_time_id") <= col("requested_at_time_id") ||
        col("completed_at_time_id") > col("requested_at_time_id") + 300).count()
    assert(bad === 0)
  }

  test("full star schema: all 15 tables generate with valid FKs") {
    val nCust = 300L
    val custs = Generate.dCustomers(spark, nCust)
    val contracts = Generate.fContracts(spark, 500, nCust).cache()
    assert(Generate.dCountry(spark).count() === 4)
    assert(Generate.dState(spark).count() === 8)
    assert(Generate.dCity(spark).count() === 11)
    assert(Generate.dYear(spark).count() === 11)
    assert(Generate.dMonth(spark).count() === 12)
    assert(Generate.dWeek(spark).count() === 53)
    assert(Generate.dWeekday(spark).count() === 7)
    assert(Generate.dTime(spark).count() === 30)
    // geo FK chain resolves
    assert(Generate.dCity(spark).join(Generate.dState(spark), Seq("state_id"))
      .join(Generate.dCountry(spark), Seq("country_id")).count() === 11)
    // identifiers: CPF for all, RG for ~70%
    val ids = Generate.dCustomerIdentifiers(spark, nCust).cache()
    assert(ids.where(col("identifier_type") === "CPF").count() === nCust)
    val rgFrac = ids.where(col("identifier_type") === "RG").count().toDouble / nCust
    assert(rgFrac > 0.6 && rgFrac < 0.8)
    // contracts join products and customers cleanly
    assert(contracts.join(Generate.dProducts(spark), Seq("product_id")).count() === 500)
    assert(contracts.join(custs, Seq("customer_id")).count() === 500)
  }

  test("EAV attributes drive the AS-OF join: every transaction gets the then-valid value") {
    import graft.plans.AsOf
    val attrs = Generate.fContractAttributes(spark, 800, nContracts = 500)
      .where(col("attribute_name") === "credit_limit")
      .select(col("contract_id"), col("valid_from").cast("long").as("valid_from"),
        col("attribute_value"))
    val txLong = Generate.fTransactions(spark, 2000, nContracts = 500)
      .select(col("transaction_id"), col("contract_id"),
        col("requested_at_time_id").cast("long").as("ts"))
    val joined = AsOf.asofJoin(txLong, attrs, "contract_id", "ts", "valid_from").cache()
    assert(joined.count() === 2000)
    // every matched value's valid_from is <= the transaction ts
    assert(joined.where(col("valid_from").isNotNull && col("valid_from") > col("ts"))
      .count() === 0)
    assert(joined.where(col("attribute_value").isNotNull).count() > 0)
  }

  test("reference gold: customer_summary / daily_metrics / product_ranking shapes") {
    val nCust = 200L
    val custs = Generate.dCustomers(spark, nCust)
    val contracts = Generate.fContracts(spark, 400, nCust)
    val products = Generate.dProducts(spark)
    val cs = Generate.referenceCustomerSummary(custs, contracts, products, txns).cache()
    assert(cs.count() === nCust)
    assert(cs.where(col("saldo_total").isNull || col("total_transacoes").isNull).count() === 0)

    val dm = Generate.referenceDailyMetrics(txns, types).cache()
    assert(dm.count() > 0)
    assert(dm.where(col("valor_medio") < col("valor_minimo") - 1e-6
      || col("valor_medio") > col("valor_maximo") + 1e-6).count() === 0)

    val pr = Generate.referenceProductRanking(txns, types, contracts, products).cache()
    val n = pr.count()
    assert(n > 0 && n <= 8)    // bounded by |d_products|
    assert(pr.select(countDistinct(col("rank_volume"))).first().getLong(0) === n)
  }

  test("reference monthly_balance over generated data: invariants hold") {
    val mb = Generate.referenceMonthlyBalance(txns, types).cache()
    assert(mb.count() > 0)
    assert(mb.where(abs(col("entradas") - col("saidas") - col("saldo_liquido")) > 1e-6).count() === 0)
    // only financial transactions are rolled up
    val financialCount = txns.join(types, Seq("transaction_type_id"))
      .where(col("is_financial")).count()
    assert(mb.agg(sum(col("total_transacoes"))).first().getLong(0) === financialCount)
  }
}

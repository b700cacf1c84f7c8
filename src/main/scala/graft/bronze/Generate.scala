package graft.bronze

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic, fully-distributed generation of the reference's star
  * schema (SURVEY §2.3, FIXTURES §B) — the "TPC-gen" of the reference
  * (`dags/1_generate_bronze_batch.py`), re-expressed as `spark.range` +
  * hash-derived values instead of driver-side Faker loops. Every value is
  * a pure function of (seed, id), so generation is reproducible, shuffles
  * nothing, and scales linearly with executors — the property the
  * reference's driver-side dict building lacks at 100 TB.
  *
  * Distribution fidelity (reference line cites):
  *  - contract statuses ACTIVE/BLOCKED/CANCELLED/PENDING = 70/15/10/5
  *    (`:370-373`); transaction statuses 85/8/5/2 (`:474-477`)
  *  - amount ranges keyed by transaction-type keyword (INVESTMENT
  *    100-10000, PIX 10-2000, CREDIT 20-5000, LOAN 1000-50000, else
  *    5-1000 — `:450-459`); amounts negated for OUT/SENT/PAYMENT/BUY
  *    types (`:461-463`)
  *  - completed = requested + 1..300 s (`:465-466`); currency 'BRL'
  *    (`:479`); end_date present for ~10% of contracts (`:363-364`)
  */
object Generate {

  private def u(seed: Int, salt: Int, id: org.apache.spark.sql.Column) =
    pmod(xxhash64(lit(seed), lit(salt), id), lit(1000000L)).cast(DoubleType) / 1000000.0

  /** 15 transaction types: ids 101-110 financial, 201-205 non-financial
    * (`dags/1_generate_bronze_batch.py:78-94`). */
  def dTransactionTypes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (Seq(
      (101, "PIX_IN", true), (102, "PIX_OUT", true), (103, "TED_IN", true),
      (104, "TED_SENT", true), (105, "CREDIT_PURCHASE_BUY", true),
      (106, "LOAN_DISBURSEMENT", true), (107, "INVESTMENT_IN", true),
      (108, "BILL_PAYMENT", true), (109, "FEE_PAYMENT", true),
      (110, "CASHBACK_IN", true),
      (201, "LOGIN", false), (202, "PASSWORD_CHANGE", false),
      (203, "CARD_BLOCK", false), (204, "LIMIT_INQUIRY", false),
      (205, "PROFILE_UPDATE", false)))
      .toDF("transaction_type_id", "transaction_type_name", "is_financial")
  }

  /** 8 products across 5 categories (`:67-76`). */
  def dProducts(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1, "Conta Corrente", "Banking"), (2, "Cartao Credito", "Credit"),
      (3, "Emprestimo Pessoal", "Credit"), (4, "CDB", "Investment"),
      (5, "Tesouro Direto", "Investment"), (6, "Seguro Vida", "Insurance"),
      (7, "Programa Pontos", "Rewards"), (8, "Conta Poupanca", "Banking"))
      .toDF("product_id", "product_name", "product_category")
  }

  def dCustomers(spark: SparkSession, n: Long, seed: Int = 42): DataFrame =
    spark.range(n).select(
      col("id").as("customer_id"),
      concat(lit("first_"), pmod(xxhash64(lit(seed), lit(1), col("id")), lit(500L))).as("first_name"),
      concat(lit("last_"), pmod(xxhash64(lit(seed), lit(2), col("id")), lit(800L))).as("last_name"))

  def fContracts(spark: SparkSession, n: Long, nCustomers: Long, seed: Int = 42): DataFrame = {
    val base = lit(java.time.LocalDateTime.parse("2024-01-01T00:00:00"))
    spark.range(n).select(
      col("id").as("contract_id"),
      pmod(xxhash64(lit(seed), lit(10), col("id")), lit(nCustomers)).as("customer_id"),
      (pmod(xxhash64(lit(seed), lit(11), col("id")), lit(8L)) + 1).cast(IntegerType).as("product_id"),
      // 70/15/10/5 weighted statuses via a uniform bucket
      when(u(seed, 12, col("id")) < 0.70, "ACTIVE")
        .when(u(seed, 12, col("id")) < 0.85, "BLOCKED")
        .when(u(seed, 12, col("id")) < 0.95, "CANCELLED")
        .otherwise("PENDING").as("contract_status"),
      // back-dated up to ~2 years from the base date
      (base - make_dt_interval(lit(0), lit(0), lit(0),
        pmod(xxhash64(lit(seed), lit(13), col("id")), lit(63072000L)).cast(DoubleType)))
        .as("start_date"),
      // ~10% carry an end_date
      when(u(seed, 14, col("id")) < 0.10,
        base - make_dt_interval(lit(0), lit(0), lit(0),
          pmod(xxhash64(lit(seed), lit(15), col("id")), lit(31536000L)).cast(DoubleType)))
        .otherwise(lit(null).cast(TimestampType)).as("end_date"))
  }

  def fTransactions(spark: SparkSession, n: Long, nContracts: Long, seed: Int = 42): DataFrame = {
    val typeIds = Seq(101, 102, 103, 104, 105, 106, 107, 108, 109, 110, 201, 202, 203, 204, 205)
    val typeId = element_at(
      array(typeIds.map(lit): _*),
      (pmod(xxhash64(lit(seed), lit(20), col("id")), lit(typeIds.size.toLong)) + 1).cast(IntegerType))
    val epochBase = 1704067200L // 2024-01-01 UTC, last ~30 days of activity
    val requested = lit(epochBase) + pmod(xxhash64(lit(seed), lit(21), col("id")), lit(2592000L))
    // amount range keyed by type-name keyword, then sign by OUT/SENT/PAYMENT/BUY
    val r = u(seed, 22, col("id"))
    val magnitude =
      when(typeId === 107, lit(100.0) + r * 9900.0)                       // INVESTMENT
        .when(typeId.isin(101, 102), lit(10.0) + r * 1990.0)              // PIX
        .when(typeId === 105, lit(20.0) + r * 4980.0)                     // CREDIT
        .when(typeId === 106, lit(1000.0) + r * 49000.0)                  // LOAN
        .otherwise(lit(5.0) + r * 995.0)
    val outflow = typeId.isin(102, 104, 105, 108, 109)                    // *_OUT/SENT/BUY/PAYMENT
    spark.range(n).select(
      col("id").as("transaction_id"),
      pmod(xxhash64(lit(seed), lit(23), col("id")), lit(nContracts)).as("contract_id"),
      typeId.as("transaction_type_id"),
      requested.cast(IntegerType).as("requested_at_time_id"),
      (requested + 1 + pmod(xxhash64(lit(seed), lit(24), col("id")), lit(300L)))
        .cast(IntegerType).as("completed_at_time_id"),
      when(u(seed, 25, col("id")) < 0.85, "COMPLETED")
        .when(u(seed, 25, col("id")) < 0.93, "PENDING")
        .when(u(seed, 25, col("id")) < 0.98, "FAILED")
        .otherwise("CANCELLED").as("transaction_status"),
      round(when(outflow, -magnitude).otherwise(magnitude), 2).as("amount"),
      lit("BRL").as("currency"))
  }

  /** Static geo hierarchy (`dags/1_generate_bronze_batch.py:35-65`). */
  def dCountry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1L, "Brasil"), (2L, "Argentina"), (3L, "Chile"), (4L, "Uruguai"))
      .toDF("country_id", "country_name")
  }

  def dState(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1L, "Sao Paulo", 1L), (2L, "Rio de Janeiro", 1L), (3L, "Minas Gerais", 1L),
      (4L, "Parana", 1L), (5L, "Buenos Aires", 2L), (6L, "Cordoba", 2L),
      (7L, "Santiago", 3L), (8L, "Montevideo", 4L))
      .toDF("state_id", "state_name", "country_id")
  }

  def dCity(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1L, "Sao Paulo", 1L), (2L, "Campinas", 1L), (3L, "Rio de Janeiro", 2L),
      (4L, "Niteroi", 2L), (5L, "Belo Horizonte", 3L), (6L, "Curitiba", 4L),
      (7L, "Buenos Aires", 5L), (8L, "La Plata", 5L), (9L, "Cordoba", 6L),
      (10L, "Santiago", 7L), (11L, "Montevideo", 8L))
      .toDF("city_id", "city_name", "state_id")
  }

  /** Static time dims (`:165-212`): years 2020-2030, months with pt-BR
    * names, ISO weeks 1-53, weekdays 1-7. */
  def dYear(spark: SparkSession): DataFrame =
    spark.range(2020, 2031).select(
      col("id").cast(IntegerType).as("year_id"),
      col("id").cast(IntegerType).as("action_year"))

  def dMonth(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq("Janeiro", "Fevereiro", "Marco", "Abril", "Maio", "Junho", "Julho",
      "Agosto", "Setembro", "Outubro", "Novembro", "Dezembro")
      .zipWithIndex.map { case (n, i) => (i + 1, i + 1, n) }
      .toDF("month_id", "action_month", "month_name")
  }

  def dWeek(spark: SparkSession): DataFrame =
    spark.range(1, 54).select(
      col("id").cast(IntegerType).as("week_id"),
      col("id").cast(IntegerType).as("action_week"))

  def dWeekday(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1, "Segunda"), (2, "Terca"), (3, "Quarta"), (4, "Quinta"),
      (5, "Sexta"), (6, "Sabado"), (7, "Domingo"))
      .toDF("weekday_id", "action_weekday")
  }

  /** `d_time`: 30 days of midnight timestamps with epoch-second ids and FK
    * links into the other time dims (`:249-271`). */
  def dTime(spark: SparkSession): DataFrame = {
    val base = 1704067200L // 2024-01-01 UTC midnight
    spark.range(30).select(
      (lit(base) + col("id") * 86400).cast(IntegerType).as("time_id"),
      (lit(base) + col("id") * 86400).cast(TimestampType).as("full_timestamp"))
      .withColumn("year_id", year(col("full_timestamp")))
      .withColumn("month_id", month(col("full_timestamp")))
      .withColumn("week_id", weekofyear(col("full_timestamp")))
      .withColumn("weekday_id", dayofweek(col("full_timestamp")))
  }

  /** Customer identifiers: CPF for everyone, RG for ~70% (`:308-328`). */
  def dCustomerIdentifiers(spark: SparkSession, nCustomers: Long, seed: Int = 42): DataFrame = {
    val cpf = spark.range(nCustomers).select(
      col("id").as("identifier_id"),
      col("id").as("customer_id"),
      lit("CPF").as("identifier_type"),
      format_string("%011d", pmod(xxhash64(lit(seed), lit(30), col("id")), lit(99999999999L)))
        .as("identifier_value"),
      lit(1L).as("country_id"))
    val rg = spark.range(nCustomers)
      .where(u(seed, 31, col("id")) < 0.70)
      .select(
        (col("id") + nCustomers).as("identifier_id"),
        col("id").as("customer_id"),
        lit("RG").as("identifier_type"),
        format_string("%09d", pmod(xxhash64(lit(seed), lit(32), col("id")), lit(999999999L)))
          .as("identifier_value"),
        lit(1L).as("country_id"))
    cpf.unionByName(rg)
  }

  private val attrNames = Seq("credit_limit", "interest_rate", "due_day",
    "auto_renew", "overdraft_limit", "channel", "segment", "score",
    "cashback_pct", "insurance_tier")

  /** EAV contract attributes: stringly-typed values with temporal validity
    * (`sql/model.md:91-99`, `dags/1_generate_bronze_batch.py:384-425`) —
    * ~20% carry a valid_to. This is the table the AS-OF join serves. */
  def fContractAttributes(spark: SparkSession, n: Long, nContracts: Long,
                          seed: Int = 42): DataFrame = {
    val base = 1704067200L
    val validFrom = lit(base) - pmod(xxhash64(lit(seed), lit(41), col("id")), lit(31536000L))
    spark.range(n).select(
      col("id").as("attribute_id"),
      pmod(xxhash64(lit(seed), lit(40), col("id")), lit(nContracts)).as("contract_id"),
      element_at(array(attrNames.map(lit): _*),
        (pmod(xxhash64(lit(seed), lit(42), col("id")), lit(attrNames.size.toLong)) + 1)
          .cast(IntegerType)).as("attribute_name"),
      // stringly-typed values, like the reference's str(...) casts
      pmod(xxhash64(lit(seed), lit(43), col("id")), lit(100000L)).cast(StringType)
        .as("attribute_value"),
      validFrom.cast(TimestampType).as("valid_from"),
      when(u(seed, 44, col("id")) < 0.20,
        (validFrom + pmod(xxhash64(lit(seed), lit(45), col("id")), lit(15768000L)))
          .cast(TimestampType))
        .otherwise(lit(null).cast(TimestampType)).as("valid_to"))
  }

  /** Gold `customer_summary` verbatim (`dags/3_silver_to_gold.py:260-277`):
    * per-contract financial summary first, then per-customer rollup with
    * collect_set product categories (sorted for determinism). */
  def referenceCustomerSummary(customers: DataFrame, contracts: DataFrame,
                               products: DataFrame, transactions: DataFrame): DataFrame = {
    val finSummary = transactions
      .groupBy(col("contract_id").as("fs_contract"))
      .agg(
        sum(col("amount")).as("saldo_contrato"),
        count(lit(1)).as("transacoes_contrato"),
        max(col("completed_at_time_id").cast(TimestampType)).as("ultima_atividade_contrato"))
    customers
      .join(contracts, Seq("customer_id"), "left")
      .join(products, Seq("product_id"), "left")
      .join(finSummary, col("contract_id") === col("fs_contract"), "left")
      .groupBy(col("customer_id"), col("first_name"), col("last_name"))
      .agg(
        countDistinct(col("contract_id")).as("total_contratos"),
        countDistinct(col("product_category")).as("categorias_produtos"),
        sum(coalesce(col("saldo_contrato"), lit(0.0))).as("saldo_total"),
        sum(coalesce(col("transacoes_contrato"), lit(0L))).as("total_transacoes"),
        max(col("ultima_atividade_contrato")).as("ultima_atividade"),
        array_sort(collect_set(col("product_category"))).as("produtos_utilizados"))
  }

  /** Gold `daily_transaction_metrics` verbatim (`:303-324`). */
  def referenceDailyMetrics(transactions: DataFrame, types: DataFrame): DataFrame =
    transactions
      .join(types, Seq("transaction_type_id"))
      .withColumn("ts", col("completed_at_time_id").cast(TimestampType))
      .where(col("ts").isNotNull)
      .groupBy(col("ts").cast(DateType).as("data_transacao"),
        col("transaction_type_name"), col("is_financial"))
      .agg(
        count(lit(1)).as("quantidade_transacoes"),
        sum(col("amount")).as("volume_total"),
        avg(col("amount")).as("valor_medio"),
        stddev(col("amount")).as("desvio_padrao"),
        min(col("amount")).as("valor_minimo"),
        max(col("amount")).as("valor_maximo"),
        countDistinct(col("contract_id")).as("contratos_unicos"))

  /** Gold `product_ranking` verbatim (`:368-392`): CTE metrics + dual
    * ROW_NUMBER ranks over the aggregated product rows. */
  def referenceProductRanking(transactions: DataFrame, types: DataFrame,
                              contracts: DataFrame, products: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val metrics = transactions
      .join(types, Seq("transaction_type_id"))
      .join(contracts, Seq("contract_id"))
      .join(products, Seq("product_id"))
      .where(col("is_financial") === true)
      .groupBy(col("product_name"), col("product_category"))
      .agg(
        count(lit(1)).as("total_transacoes"),
        sum(abs(col("amount"))).as("volume_financeiro"),
        countDistinct(col("contract_id")).as("contratos_ativos"),
        countDistinct(col("customer_id")).as("clientes_unicos"),
        avg(abs(col("amount"))).as("ticket_medio"))
    metrics
      .withColumn("rank_volume", row_number().over(
        Window.orderBy(col("volume_financeiro").desc, col("product_name"))))
      .withColumn("rank_transacoes", row_number().over(
        Window.orderBy(col("total_transacoes").desc, col("product_name"))))
  }

  /** The reference's gold monthly_balance verbatim over generated data
    * (`dags/3_silver_to_gold.py:162-183`): financial types only, epoch-int
    * → timestamp cast, conditional in/out sums per (year, month, contract). */
  def referenceMonthlyBalance(transactions: DataFrame, types: DataFrame): DataFrame =
    transactions
      .join(types, Seq("transaction_type_id"))
      .where(col("is_financial") === true &&
        col("completed_at_time_id").cast(TimestampType).isNotNull)
      .withColumn("ts", col("completed_at_time_id").cast(TimestampType))
      .groupBy(year(col("ts")).as("ano"), month(col("ts")).as("mes"), col("contract_id"))
      .agg(
        sum(when(col("amount") > 0, col("amount")).otherwise(0.0)).as("entradas"),
        sum(when(col("amount") < 0, abs(col("amount"))).otherwise(0.0)).as("saidas"),
        sum(col("amount")).as("saldo_liquido"),
        count(lit(1)).as("total_transacoes"),
        avg(col("amount")).as("valor_medio_transacao"),
        max(col("amount")).as("maior_entrada"),
        min(col("amount")).as("menor_transacao"))
}

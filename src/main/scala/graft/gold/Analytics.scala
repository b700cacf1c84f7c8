package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Dsl, Tables}
import graft.Dsl._

/** The reference's four gold analytic tables (reference:
  * `dags/3_silver_to_gold.py:162-183, :260-277, :303-324, :368-392`),
  * re-expressed Spark-first over the driver testdata per the role mapping
  * in FIXTURES.md §A (`events`~f_transactions, `orders`~f_contracts,
  * `customer`~d_customers, `part`~d_products).
  *
  * Scale notes (100 TB design):
  *  - every aggregation here is a hash agg with map-side partials; Catalyst
  *    plans partial+final automatically, nothing driver-side.
  *  - dimension joins (`part`, `customer`) are broadcast-hinted — dims are
  *    tiny relative to facts at any scale factor.
  *  - the ranking windows run over *aggregated* outputs (one row per
  *    product), so the single-partition window is bounded by the dimension
  *    cardinality, not the fact table — safe at 1000 executors.
  */
object Analytics {

  /** Signed amount: the reference negates amounts for outflow transaction
    * types (name contains OUT/SENT/PAYMENT/BUY —
    * `dags/1_generate_bronze_batch.py:461-463`); `purchase`/`error` play
    * the outflow roles here. */
  private val amount =
    when(col("event_type").isin("purchase", "error"), -col("value"))
      .otherwise(col("value"))

  /** Gold `monthly_balance` (`dags/3_silver_to_gold.py:162-183`):
    * per (year, month, account) inflow/outflow/net with conditional sums. */
  def monthlyBalance(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .where(col("ts").isNotNull)
      .withColumn("amount", amount)
      .groupBy(
        year(col("ts")).as("ano"),
        month(col("ts")).as("mes"),
        col("user_id"))
      .agg(
        dsum(when(col("amount") > 0, col("amount")).otherwise(lit(0.0))).as("entradas"),
        dsum(when(col("amount") < 0, abs(col("amount"))).otherwise(lit(0.0))).as("saidas"),
        dsum(col("amount")).as("saldo_liquido"),
        count(lit(1)).as("total_transacoes"),
        davg(col("amount")).as("valor_medio_transacao"),
        max(when(col("amount") > 0, col("amount"))).as("maior_entrada"),
        max(when(col("amount") < 0, abs(col("amount")))).as("maior_saida"))

  /** Gold `customer_summary` (`dags/3_silver_to_gold.py:260-277`):
    * two-level (per-order partial → per-customer final) aggregation joined
    * back to the customer dim (A9), with COLLECT_SET (A7) and null-safe
    * re-aggregation over left joins (A8). Pre-aggregating per order before
    * the customer rollup keeps the join input small — the same manual
    * partial/final split the reference hand-writes. */
  def customerSummary(spark: SparkSession, dir: String): DataFrame = {
    val li   = Tables.lineitem(spark, dir)
    val ord  = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val part = Tables.part(spark, dir)

    // level 1: per-order financial summary (exact decimal revenue)
    val ordFin = li.groupBy(col("l_orderkey")).agg(
      count(lit(1)).as("n_items"),
      dsumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))

    // level 2: per-customer rollup of orders (left join keeps empty orders)
    val custOrders = ord
      .join(ordFin, ord("o_orderkey") === ordFin("l_orderkey"), "left")
      .groupBy(col("o_custkey").as("ck1"))
      .agg(
        count(col("o_orderkey")).as("total_contratos"),
        sum(coalesce(col("revenue"), lit(0))).cast(DoubleType).as("saldo_total"),
        sum(coalesce(col("n_items"), lit(0L))).as("total_transacoes"),
        max(col("o_orderdate")).as("ultima_atividade"))

    // product usage per customer (J5-style chain, collect_set sorted for
    // determinism). Both distinct quantities come from collect_set in ONE
    // ObjectHashAggregate pass: size(collect_set(p_type)) equals
    // countDistinct(p_type) but avoids the expand + multi-stage plan that
    // mixing countDistinct with an object aggregate would force.
    val custProds = li
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("ck2"))
      .agg(
        size(collect_set(col("p_type"))).cast(LongType).as("categorias_produtos"),
        // COLLECT_SET (A7) sorted for determinism, then joined to a scalar
        // string: the driver's row-sort can't order array cells, and the
        // csv form is what the reference's consumers see anyway.
        array_join(array_sort(collect_set(col("p_brand"))), ",").as("produtos_utilizados"))

    cust
      .join(custOrders, cust("c_custkey") === custOrders("ck1"), "left")
      .join(custProds, cust("c_custkey") === custProds("ck2"), "left")
      .select(
        col("c_custkey").as("customer_id"),
        col("c_name"),
        col("c_mktsegment"),
        coalesce(col("total_contratos"), lit(0L)).as("total_contratos"),
        coalesce(col("saldo_total"), lit(0.0)).as("saldo_total"),
        coalesce(col("total_transacoes"), lit(0L)).as("total_transacoes"),
        col("ultima_atividade"),
        coalesce(col("categorias_produtos"), lit(0L)).as("categorias_produtos"),
        coalesce(col("produtos_utilizados"), lit("")).as("produtos_utilizados"))
  }

  /** Gold `daily_transaction_metrics` (`dags/3_silver_to_gold.py:303-324`):
    * per (day, type) stats incl. stddev (A5) and distinct counts (A6).
    *
    * The distinct count runs as its OWN aggregation joined back on the
    * group keys: mixing countDistinct with the decimal stat aggregates in
    * one agg makes Spark plan expand + multi-stage aggregation with every
    * sum riding each stage (~2x the cost at sf0.1); a lone countDistinct
    * plans as clean two-level hash aggs, and the extra scan is cheap. */
  def dailyMetrics(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .where(col("l_shipdate").isNotNull)
      .select(
        // midnight TIMESTAMP_NTZ, not DATE: date32 parquet output compares
        // as python `date` objects vs the oracle's datetime64 — same value,
        // different type. A timestamp day-floor is type-stable end to end.
        col("l_shipdate").cast(DateType).cast("timestamp_ntz").as("data"),
        col("l_returnflag"), col("l_orderkey"), col("l_extendedprice"))
    val stats = li
      .groupBy(col("data"), col("l_returnflag"))
      .agg(
        count(lit(1)).as("quantidade_transacoes"),
        dsum(col("l_extendedprice")).as("volume_total"),
        davg(col("l_extendedprice")).as("valor_medio"),
        dstddev(col("l_extendedprice")).as("desvio_padrao"),
        min(col("l_extendedprice")).as("valor_minimo"),
        max(col("l_extendedprice")).as("valor_maximo"))
    val uniq = li
      .groupBy(col("data"), col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("pedidos_unicos"))
    stats.join(uniq, Seq("data", "l_returnflag"))
  }

  /** Gold `product_ranking` (`dags/3_silver_to_gold.py:368-392`):
    * 4-way join chain (J5) → per-product aggregates → dual ROW_NUMBER
    * rankings (W1/W2). The window is unpartitioned but runs over the
    * aggregated per-product rows (bounded by |part| dimension), so it does
    * not serialize fact-table volume at scale. Ties broken by the full
    * grouping key so ranking is deterministic. */
  def productRanking(spark: SparkSession, dir: String): DataFrame = {
    val li   = Tables.lineitem(spark, dir)
    val ord  = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val part = Tables.part(spark, dir)

    // Two-level (product, order) partial aggregation instead of mixing
    // two countDistincts with decimal sums in one agg (which plans
    // expand x3 with every sum riding each stage). o_orderkey determines
    // c_custkey, so pedidos_unicos falls out as the level-2 row count and
    // the customer survives level 1 as a group constant; the partial sums
    // re-aggregate exactly (decimal addition is associative). lvl1 is
    // materialized once for its two consumers.
    val lvl1 = li
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .where(col("o_orderstatus") === "F" && col("l_shipdate").isNotNull)
      .select(
        col("p_name").as("product_name"),
        col("p_brand").as("product_brand"),
        col("p_type").as("product_category"),
        col("o_orderkey"), col("c_custkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("amt"))
      .groupBy(col("product_name"), col("product_brand"), col("product_category"),
        col("o_orderkey"))
      .agg(
        count(lit(1)).as("n"),
        sum(Dsl.money(col("amt"))).as("s"),
        first(col("c_custkey")).as("ck"))
    val prodKeys = Seq("product_name", "product_brand", "product_category")
    val base = lvl1
      .groupBy(prodKeys.map(col): _*)
      .agg(
        sum(col("n")).as("total_transacoes"),
        sum(col("s")).cast(DoubleType).as("volume_financeiro"),
        count(lit(1)).as("pedidos_unicos"),
        (sum(col("s")).cast(DoubleType) / sum(col("n"))).as("ticket_medio"))
    val uniqCust = lvl1
      .groupBy(prodKeys.map(col): _*)
      .agg(countDistinct(col("ck")).as("clientes_unicos"))
    val metrics = base.join(uniqCust, prodKeys)
      .select(col("product_name"), col("product_brand"), col("product_category"),
        col("total_transacoes"), col("volume_financeiro"), col("pedidos_unicos"),
        col("clientes_unicos"), col("ticket_medio"))

    val byVolume = Window.orderBy(
      col("volume_financeiro").desc,
      col("product_name"), col("product_brand"), col("product_category"))
    val byCount = Window.orderBy(
      col("total_transacoes").desc,
      col("product_name"), col("product_brand"), col("product_category"))

    metrics
      .withColumn("rank_volume", row_number().over(byVolume))
      .withColumn("rank_transacoes", row_number().over(byCount))
  }

  /** EAV/JSON extraction stats: the reference stores flexible attributes
    * stringly-typed (`f_contract_attributes.attribute_value varchar` —
    * `sql/model.md:91-99`); `events.props` plays that role as JSON. Pure
    * integer aggregation after extraction, so no decimal gymnastics. */
  def eventsJsonStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast(IntegerType))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        (sum(col("k")).cast(DoubleType) / count(col("k"))).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        countDistinct(col("k")).as("distinct_k"))

  /** Oracle SQL (DuckDB) for each query above — kept adjacent to the Scala
    * so column names/expressions cannot drift. */
  object oracle {
    private val amountSql =
      "CASE WHEN event_type IN ('purchase','error') THEN -value ELSE value END"

    val monthlyBalance: String =
      s"""WITH e AS (SELECT *, $amountSql AS amount FROM events WHERE ts IS NOT NULL)
         |SELECT CAST(year(ts) AS INT) AS ano, CAST(month(ts) AS INT) AS mes, user_id,
         |  ${Dsl.sql.dsum("CASE WHEN amount > 0 THEN amount ELSE 0.0 END")} AS entradas,
         |  ${Dsl.sql.dsum("CASE WHEN amount < 0 THEN abs(amount) ELSE 0.0 END")} AS saidas,
         |  ${Dsl.sql.dsum("amount")} AS saldo_liquido,
         |  COUNT(*) AS total_transacoes,
         |  ${Dsl.sql.davg("amount")} AS valor_medio_transacao,
         |  MAX(CASE WHEN amount > 0 THEN amount END) AS maior_entrada,
         |  MAX(CASE WHEN amount < 0 THEN abs(amount) END) AS maior_saida
         |FROM e GROUP BY 1, 2, 3""".stripMargin

    val customerSummary: String =
      s"""WITH ord_fin AS (
         |  SELECT l_orderkey, COUNT(*) AS n_items,
         |         SUM(CAST((l_extendedprice * (1.0 - l_discount)) AS DECIMAL(18,6))) AS revenue
         |  FROM lineitem GROUP BY 1),
         |cust_orders AS (
         |  SELECT o_custkey AS ck1,
         |         COUNT(o_orderkey) AS total_contratos,
         |         CAST(SUM(COALESCE(revenue, 0)) AS DOUBLE) AS saldo_total,
         |         CAST(SUM(COALESCE(n_items, 0)) AS BIGINT) AS total_transacoes,
         |         MAX(o_orderdate) AS ultima_atividade
         |  FROM orders LEFT JOIN ord_fin ON o_orderkey = l_orderkey GROUP BY 1),
         |cust_prods AS (
         |  SELECT o_custkey AS ck2, COUNT(DISTINCT p_type) AS categorias_produtos,
         |         array_to_string(list_sort(list(DISTINCT p_brand)), ',') AS produtos_utilizados
         |  FROM lineitem
         |  JOIN part   ON l_partkey  = p_partkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1)
         |SELECT c_custkey AS customer_id, c_name, c_mktsegment,
         |  COALESCE(total_contratos, 0) AS total_contratos,
         |  COALESCE(saldo_total, 0.0) AS saldo_total,
         |  COALESCE(total_transacoes, 0) AS total_transacoes,
         |  ultima_atividade,
         |  COALESCE(categorias_produtos, 0) AS categorias_produtos,
         |  COALESCE(produtos_utilizados, '') AS produtos_utilizados
         |FROM customer
         |LEFT JOIN cust_orders ON c_custkey = ck1
         |LEFT JOIN cust_prods  ON c_custkey = ck2""".stripMargin

    val eventsJsonStats: String =
      s"""SELECT event_type,
         |  COUNT(CAST(json_extract_string(props, '$$.k') AS INT)) AS n_with_k,
         |  CAST(SUM(CAST(json_extract_string(props, '$$.k') AS INT)) AS BIGINT) AS sum_k,
         |  CAST(SUM(CAST(json_extract_string(props, '$$.k') AS INT)) AS DOUBLE)
         |    / COUNT(CAST(json_extract_string(props, '$$.k') AS INT)) AS avg_k,
         |  MIN(CAST(json_extract_string(props, '$$.k') AS INT)) AS min_k,
         |  MAX(CAST(json_extract_string(props, '$$.k') AS INT)) AS max_k,
         |  COUNT(DISTINCT CAST(json_extract_string(props, '$$.k') AS INT)) AS distinct_k
         |FROM events GROUP BY 1""".stripMargin

    val dailyMetrics: String =
      s"""SELECT CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS data, l_returnflag,
         |  COUNT(*) AS quantidade_transacoes,
         |  ${Dsl.sql.dsum("l_extendedprice")} AS volume_total,
         |  ${Dsl.sql.davg("l_extendedprice")} AS valor_medio,
         |  ${Dsl.sql.dstddev("l_extendedprice")} AS desvio_padrao,
         |  MIN(l_extendedprice) AS valor_minimo,
         |  MAX(l_extendedprice) AS valor_maximo,
         |  COUNT(DISTINCT l_orderkey) AS pedidos_unicos
         |FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1, 2""".stripMargin

    val productRanking: String =
      s"""WITH product_metrics AS (
         |  SELECT p_name AS product_name, p_brand AS product_brand, p_type AS product_category,
         |    COUNT(*) AS total_transacoes,
         |    ${Dsl.sql.dsum("l_extendedprice * (1.0 - l_discount)")} AS volume_financeiro,
         |    COUNT(DISTINCT o_orderkey) AS pedidos_unicos,
         |    COUNT(DISTINCT c_custkey) AS clientes_unicos,
         |    ${Dsl.sql.davg("l_extendedprice * (1.0 - l_discount)")} AS ticket_medio
         |  FROM lineitem
         |  JOIN part     ON l_partkey = p_partkey
         |  JOIN orders   ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  WHERE o_orderstatus = 'F' AND l_shipdate IS NOT NULL
         |  GROUP BY 1, 2, 3)
         |SELECT *,
         |  CAST(ROW_NUMBER() OVER (ORDER BY volume_financeiro DESC, product_name, product_brand, product_category) AS INT) AS rank_volume,
         |  CAST(ROW_NUMBER() OVER (ORDER BY total_transacoes DESC, product_name, product_brand, product_category) AS INT) AS rank_transacoes
         |FROM product_metrics""".stripMargin
  }
}

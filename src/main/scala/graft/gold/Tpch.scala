package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, TimestampType}

import graft.{Dsl, Tables}
import graft.Dsl._

/** Classic scan→filter→agg / join→agg→rank shapes over the TPC-H-ish
  * testdata. These are the bench headliners: they exercise parquet
  * predicate pushdown, partial aggregation, broadcast joins, and
  * rank-based top-k (no global sort of the fact table).
  */
object Tpch {

  /** Q1-style pricing summary: single wide scan → hash agg. The filter and
    * the 7-column projection both push into the parquet scan. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= to_timestamp_ntz(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Q3-style shipping priority: selective dim filter broadcast against the
    * facts, grouped revenue, top-10 via rank (two-phase safe: the window
    * input is already aggregated per order). */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).where(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(spark, dir)
      .where(col("o_orderdate") < to_timestamp_ntz(lit("1998-01-01 00:00:00")))
    val li   = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") > to_timestamp_ntz(lit("1998-01-01 00:00:00")))

    val grouped = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))

    // deterministic orderBy+limit plans as TakeOrderedAndProject
    // (per-partition heaps); the rank window then covers only the 10
    // survivors instead of single-partitioning every order aggregate
    grouped
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("revenue").desc, col("o_orderkey"))))
  }

  /** Q5-style local-supplier volume: 6-way join down the geo hierarchy
    * (region→nation→customer→orders→lineitem→supplier) with the
    * same-nation condition. Dims broadcast; the facts join shuffles once
    * on orderkey. */
  def q5LocalSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).where(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val cust   = Tables.customer(spark, dir)
    val ord    = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= to_timestamp_ntz(lit("1996-01-01 00:00:00"))
        && col("o_orderdate") < to_timestamp_ntz(lit("1998-01-01 00:00:00")))
    val li     = Tables.lineitem(spark, dir)
    val supp   = Tables.supplier(spark, dir)

    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey")
        && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Q6-style forecast revenue: pure scan→filter→agg; every predicate and
    * the 2-column projection push into the parquet scan. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= to_timestamp_ntz(lit("1997-01-01 00:00:00"))
        && col("l_shipdate") < to_timestamp_ntz(lit("1998-01-01 00:00:00"))
        && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
        && col("l_quantity") < 24.0)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))

  /** Q18-style large orders: HAVING on a grouped fact, then join back to
    * the order/customer context — the aggregate-then-semi-join shape. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val li  = Tables.lineitem(spark, dir)
    val big = li.groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .where(col("total_qty") > 200.0)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
  }

  /** ROLLUP over (year, month) with GROUPING() markers — hierarchical
    * subtotal shape the reference lacks but any analytics engine needs.
    * Null keys from rollup are disambiguated via grouping() flags. */
  def rollupVolume(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      // grouping() must reference the rollup keys verbatim, so project the
      // derived keys to named columns first
      .select(year(col("o_orderdate")).as("ano"),
        month(col("o_orderdate")).as("mes"), col("o_totalprice"))
      .rollup(col("ano"), col("mes"))
      .agg(
        dsum(col("o_totalprice")).as("volume"),
        count(lit(1)).as("n_orders"),
        grouping(col("ano")).cast("int").as("g_ano"),
        grouping(col("mes")).cast("int").as("g_mes"))

  /** Semi/anti joins (EXISTS / NOT EXISTS): customers tagged by whether
    * they have any order — the reference's J7 anti-join shape surfaced as
    * a first-class query. */
  def semiAntiCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_name"))
    val ordKeys = Tables.orders(spark, dir).select(col("o_custkey"))
    val has = cust.join(ordKeys, col("c_custkey") === col("o_custkey"), "left_semi")
      .withColumn("tag", lit("has_order"))
    val not = cust.join(ordKeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .withColumn("tag", lit("no_order"))
    has.unionByName(not)
  }

  /** Q4-style: orders with at least one lineitem shipped >90 days after
    * the order date (EXISTS with a correlated predicate), counted per
    * priority. */
  def q4LateOrders(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val li  = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
      col("o_orderkey") === col("l_orderkey")
        && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
      "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("late_orders"))
  }

  /** Q14-style: revenue share of 'ECONOMY%' parts — LIKE predicate inside
    * a conditional aggregate ratio. */
  def q14EconomyShare(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .agg(
        (dsum(when(col("p_type").like("ECONOMY%"), rev).otherwise(lit(0.0))) * 100.0
          / dsum(rev)).as("economy_share_pct"),
        count(lit(1)).as("n_items"))
  }

  /** Q7-style: trade volume between supplier-nation and customer-nation
    * pairs — the same dimension joined twice under different roles. */
  def q7NationVolume(spark: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .where(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"),
        count(lit(1)).as("n_items"))
  }

  /** Q10-style: revenue lost to returned items per customer + nation,
    * top-20 by revenue (rank over the aggregated per-customer rows —
    * bounded by |customer|, never fact volume). */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .where(col("l_returnflag") === "R")
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(dsum(rev).as("revenue"), count(lit(1)).as("n_items"))
      // top-k via TakeOrderedAndProject; rank only the 20 survivors
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("revenue").desc, col("c_custkey"))))
  }

  /** Q19-style: disjunctive multi-band predicates (brand x size x
    * quantity) — exercises OR-of-conjunctions pushdown across a join. */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15)
          && col("l_quantity").between(1.0, 15.0)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30)
          && col("l_quantity").between(10.0, 25.0)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50)
          && col("l_quantity").between(20.0, 40.0)))
      .agg(dsum(rev).as("revenue"), count(lit(1)).as("n_items"))
  }

  /** Q22-style: wealthy dormant customers — a scalar AVG subquery feeding
    * a filter plus NOT EXISTS against the recent-order set (anti join with
    * a filtered build side), rolled up per market segment. */
  def q22WealthyInactive(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val avgBal = cust.where(col("c_acctbal") > 0.0)
      .agg((sum(Dsl.money(col("c_acctbal"))).cast(DoubleType)
        / count(col("c_acctbal"))).as("avg_bal"))
    val recent = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("2000-01-01").cast(TimestampType))
      .select(col("o_custkey"))
    cust
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(avgBal))
      .where(col("c_acctbal") > col("avg_bal"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("total_bal"))
  }

  /** Deterministic promo windows for the range join: 8 monthly windows,
    * one every 90 days from 1996-01-01. Shared with the oracle generator
    * so both engines see identical literals. */
  private[gold] val promoPeriods: Seq[(String, String, String)] = {
    import java.time.LocalDate
    (0 until 8).map { k =>
      val s = LocalDate.of(1996, 1, 1).plusDays(90L * k)
      (s"promo_$k", s.toString, s.plusDays(30).toString)
    }
  }

  /** Range (theta) join: lineitems matched to promo periods by
    * `l_shipdate BETWEEN start AND end` — a non-equi join the reference
    * lacks. The period table is tiny and broadcast, so the physical plan
    * is a map-only BroadcastNestedLoopJoin; at scale the standard upgrade
    * is bucketing dates to a coarse equi-key first. */
  def rangeJoinPromo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val promos = promoPeriods.toDF("promo_id", "p_start", "p_end")
      .select(col("promo_id"),
        col("p_start").cast(TimestampType).as("p_start"),
        col("p_end").cast(TimestampType).as("p_end"))
    Tables.lineitem(spark, dir)
      .join(broadcast(promos),
        col("l_shipdate") >= col("p_start") && col("l_shipdate") <= col("p_end"))
      .groupBy(col("promo_id"))
      .agg(
        count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  /** CUBE over (status, priority) with GROUPING() markers — all four
    * grouping combinations in one pass (rollupVolume covers ROLLUP). */
  def cubeVolume(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        dsum(col("o_totalprice")).as("volume"),
        count(lit(1)).as("n_orders"),
        grouping(col("o_orderstatus")).cast(IntegerType).as("g_status"),
        grouping(col("o_orderpriority")).cast(IntegerType).as("g_prio"))

  object oracle {
    val q4LateOrders: String =
      s"""SELECT o_orderpriority, COUNT(*) AS late_orders
         |FROM orders
         |WHERE EXISTS (
         |  SELECT 1 FROM lineitem
         |  WHERE l_orderkey = o_orderkey
         |    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
         |GROUP BY 1""".stripMargin

    val q14EconomyShare: String =
      s"""SELECT
         |  ${Dsl.sql.dsum("CASE WHEN p_type LIKE 'ECONOMY%' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} * 100.0
         |    / ${Dsl.sql.dsum("l_extendedprice * (1.0 - l_discount)")} AS economy_share_pct,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin

    val q7NationVolume: String =
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  ${Dsl.sql.dsum("l_extendedprice * (1.0 - l_discount)")} AS volume,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE n1.n_name <> n2.n_name
         |GROUP BY 1, 2""".stripMargin

    val semiAntiCustomers: String =
      s"""SELECT c_custkey, c_name, 'has_order' AS tag FROM customer
         |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         |UNION ALL
         |SELECT c_custkey, c_name, 'no_order' AS tag FROM customer
         |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

    val q1PricingSummary: String =
      s"""SELECT l_returnflag, l_linestatus,
         |  ${Dsl.sql.dsum("l_quantity")} AS sum_qty,
         |  ${Dsl.sql.dsum("l_extendedprice")} AS sum_base_price,
         |  ${Dsl.sql.dsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${Dsl.sql.dsum("(l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)")} AS sum_charge,
         |  ${Dsl.sql.davg("l_quantity")} AS avg_qty,
         |  ${Dsl.sql.davg("l_extendedprice")} AS avg_price,
         |  ${Dsl.sql.davg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY 1, 2""".stripMargin

    val q5LocalSupplierVolume: String =
      s"""SELECT n_name,
         |  ${Dsl.sql.dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1""".stripMargin

    val q6ForecastRevenue: String =
      s"""SELECT ${Dsl.sql.dsum("l_extendedprice * l_discount")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0""".stripMargin

    val q18LargeOrders: String =
      s"""WITH big AS (
         |  SELECT l_orderkey, ${Dsl.sql.dsum("l_quantity")} AS total_qty
         |  FROM lineitem GROUP BY 1 HAVING ${Dsl.sql.dsum("l_quantity")} > 200.0)
         |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
         |FROM orders
         |JOIN big      ON o_orderkey = l_orderkey
         |JOIN customer ON o_custkey = c_custkey""".stripMargin

    val rollupVolume: String =
      s"""SELECT CAST(year(o_orderdate) AS INT) AS ano, CAST(month(o_orderdate) AS INT) AS mes,
         |  ${Dsl.sql.dsum("o_totalprice")} AS volume,
         |  COUNT(*) AS n_orders,
         |  CAST(GROUPING(year(o_orderdate)) AS INT) AS g_ano,
         |  CAST(GROUPING(month(o_orderdate)) AS INT) AS g_mes
         |FROM orders
         |GROUP BY ROLLUP (year(o_orderdate), month(o_orderdate))""".stripMargin

    val q3ShippingPriority: String =
      s"""WITH grouped AS (
         |  SELECT o_orderkey, o_orderdate, o_orderpriority,
         |    ${Dsl.sql.dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |  FROM lineitem
         |  JOIN orders   ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  WHERE c_mktsegment = 'BUILDING'
         |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |    AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
         |  GROUP BY 1, 2, 3)
         |SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, o_orderkey) AS INT) AS rk
         |FROM grouped QUALIFY rk <= 10""".stripMargin

    val q10ReturnedItems: String =
      s"""WITH grouped AS (
         |  SELECT c_custkey, c_name, n_name,
         |    ${Dsl.sql.dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |    COUNT(*) AS n_items
         |  FROM lineitem
         |  JOIN orders   ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation   ON c_nationkey = n_nationkey
         |  WHERE l_returnflag = 'R'
         |  GROUP BY 1, 2, 3)
         |SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) AS INT) AS rk
         |FROM grouped QUALIFY rk <= 20""".stripMargin

    val q19Disjunctive: String =
      s"""SELECT
         |  ${Dsl.sql.dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 1.0 AND 15.0)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
         |       AND l_quantity BETWEEN 10.0 AND 25.0)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
         |       AND l_quantity BETWEEN 20.0 AND 40.0)""".stripMargin

    val q22WealthyInactive: String =
      s"""WITH a AS (
         |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal
         |  FROM customer WHERE c_acctbal > 0.0)
         |SELECT c_mktsegment, COUNT(*) AS n_customers,
         |  ${Dsl.sql.dsum("c_acctbal")} AS total_bal
         |FROM customer, a
         |WHERE c_acctbal > avg_bal
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
         |GROUP BY 1""".stripMargin

    val rangeJoinPromo: String = {
      val values = promoPeriods.map { case (id, s, e) =>
        s"('$id', TIMESTAMP '$s 00:00:00', TIMESTAMP '$e 00:00:00')"
      }.mkString(",\n         |    ")
      s"""WITH promos(promo_id, p_start, p_end) AS (VALUES
         |    $values)
         |SELECT promo_id, COUNT(*) AS n_items,
         |  ${Dsl.sql.dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem JOIN promos
         |  ON l_shipdate >= p_start AND l_shipdate <= p_end
         |GROUP BY 1""".stripMargin
    }

    val cubeVolume: String =
      s"""SELECT o_orderstatus, o_orderpriority,
         |  ${Dsl.sql.dsum("o_totalprice")} AS volume,
         |  COUNT(*) AS n_orders,
         |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
         |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
         |FROM orders
         |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin
  }
}

package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

    grouped
      .withColumn("rk",
        row_number().over(Window.orderBy(col("revenue").desc, col("o_orderkey"))))
      .where(col("rk") <= 10)
  }

  object oracle {
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
  }
}

package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Scalar-function breadth (SURVEY §2.8 lists the reference's thin usage;
  * an engine's users expect the full set). Two projection-only queries —
  * no shuffle at all, pure codegen'd row transforms — oracle-checked
  * function by function. Only functions with identical cross-engine
  * semantics are included (e.g. dayofweek numbering differs, so weekday
  * is derived via an explicit formula on both sides).
  */
object Scalars {

  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey"),
      upper(col("c_name")).as("up"),
      lower(col("c_mktsegment")).as("lo"),
      substring(col("c_name"), 1, 8).as("sub"),
      length(col("c_name")).as("len"),
      concat_ws("|", col("c_name"), col("c_mktsegment")).as("joined"),
      trim(lit("  pad  ")).as("trimmed"),
      lpad(col("c_custkey").cast(StringType), 8, "0").as("padded"),
      col("c_name").like("%1%").as("has_one"),
      regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
      replace(col("c_mktsegment"), lit("A"), lit("@")).as("replaced"),
      reverse(col("c_mktsegment")).as("rev"),
      split(col("c_name"), "#").getItem(0).as("name_prefix"),
      instr(col("c_mktsegment"), "U").as("u_pos"))

  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      quarter(col("o_orderdate")).as("q"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("d"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      (col("o_orderdate") + expr("INTERVAL 45 DAYS")).as("plus45"),
      datediff(col("o_orderdate"), to_timestamp_ntz(lit("1995-01-01 00:00:00")))
        .as("days_since_95"),
      unix_timestamp(col("o_orderdate").cast(TimestampType)).as("epoch_s"),
      col("o_orderdate").cast(DateType).cast(TimestampType).as("day_floor"))

  object oracle {
    val stringFuncs: String =
      s"""SELECT c_custkey,
         |  upper(c_name) AS up,
         |  lower(c_mktsegment) AS lo,
         |  substring(c_name, 1, 8) AS sub,
         |  CAST(length(c_name) AS INT) AS len,
         |  concat_ws('|', c_name, c_mktsegment) AS joined,
         |  trim('  pad  ') AS trimmed,
         |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
         |  c_name LIKE '%1%' AS has_one,
         |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
         |  replace(c_mktsegment, 'A', '@') AS replaced,
         |  reverse(c_mktsegment) AS rev,
         |  string_split(c_name, '#')[1] AS name_prefix,
         |  CAST(instr(c_mktsegment, 'U') AS INT) AS u_pos
         |FROM customer""".stripMargin

    val dateFuncs: String =
      s"""SELECT o_orderkey,
         |  CAST(year(o_orderdate) AS INT) AS y,
         |  CAST(quarter(o_orderdate) AS INT) AS q,
         |  CAST(month(o_orderdate) AS INT) AS m,
         |  CAST(day(o_orderdate) AS INT) AS d,
         |  date_trunc('month', o_orderdate) AS month_start,
         |  o_orderdate + INTERVAL 45 DAY AS plus45,
         |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_95,
         |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
         |  CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day_floor
         |FROM orders""".stripMargin
  }
}

package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, TimestampType}

import graft.{Dsl, Tables}
import graft.Dsl._

/** Second wave of classic decision-support shapes, filling the TPC-H query
  * patterns `Tpch` doesn't cover: correlated MIN / AVG subqueries (q2/q17),
  * ratio-per-group market share (q8), LIKE-filtered multi-dim rollups (q9),
  * HAVING against a global scalar (q11), left-join count distributions
  * (q13), argmax-by-scalar-subquery (q15), NOT IN + distinct counts (q16),
  * and the sole-late-supplier EXISTS/NOT-EXISTS chain (q21).
  *
  * The testdata star schema has no partsupp table and no
  * commitdate/receiptdate, so the partsupp-driven predicates are re-based
  * onto lineitem (unit price = l_extendedprice / l_quantity — a
  * deterministic per-row double division) and lateness is measured as
  * shipdate > orderdate + 60 days.
  *
  * Scale notes: every correlated subquery is expressed as its distributed
  * rewrite — a grouped aggregate joined back on the correlation key — so
  * nothing degenerates to per-row subquery execution; the oracle SQL keeps
  * the textbook correlated form, making each comparison also an
  * equivalence check between the two formulations. Dimension sides
  * broadcast; fact-fact self-joins shuffle once on the correlation key.
  */
object Tpch2 {

  private def rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Q2-style correlated MIN: for each small part, the supplier(s) offering
    * the minimum unit price. The per-part min rides an unbounded window
    * over the partkey partition — one scan, one shuffle (a grouped-min +
    * join-back re-executes the scan subtree for the min branch); ties keep
    * all minimal suppliers in both engines. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val up = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
    up.withColumn("min_unit",
        min(col("unit_price")).over(Window.partitionBy(col("l_partkey"))))
      .where(col("unit_price") === col("min_unit"))
      .join(broadcast(Tables.part(spark, dir).where(col("p_size") < 20)),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("min_unit"))
      .distinct()
  }

  /** Q8-style market share: the fraction of AMERICA-region customers' order
    * revenue supplied from NATION_3, per order year. The ratio is exact
    * decimal sums divided once in double — bit-stable. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val custNation = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_regionkey"))
    val amer = Tables.region(spark, dir).where(col("r_name") === "AMERICA")
    val suppNation = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("c_nk"))
      .join(broadcast(amer), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).cast(IntegerType).as("yr"))
      .agg(
        (dsum(when(col("supp_nation") === "NATION_3", rev).otherwise(lit(0.0)))
          / dsum(rev)).as("mkt_share"),
        count(lit(1)).as("n_items"))
  }

  /** Q9-style profit rollup: revenue from 'widget' parts by supplier nation
    * and ship year — LIKE-filtered dimension broadcast into a two-key agg. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).where(col("p_name").contains("widget"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).cast(IntegerType).as("yr"))
      .agg(dsum(rev).as("profit"), count(lit(1)).as("n_items"))

  /** Q11-style important parts: per-part value exceeding a multiple of the
    * mean part value — HAVING against a scalar subquery; the global mean is
    * a one-row broadcast, not a second scan of the grouped data. The
    * threshold is mean-relative (TPC-H's own `0.0001/SF` generalized) so
    * the selectivity survives any scale factor. */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    // The global mean is a scalar tree-aggregate over the per-part rows,
    // broadcast back as one row. An empty-partition window here would put
    // EVERY per-part aggregate on a single reducer — billions of rows at
    // 100 TB; the scalar form has no single-reducer stage, and the
    // per-part aggregation below it is shared between both consumers via
    // ReusedExchange (the branches are identical up to the shuffle), so
    // lineitem is still scanned once.
    val perPart = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(dsumDec(col("l_extendedprice")).as("val_dec"))
    val mean = perPart.agg(
      (sum(col("val_dec")).cast(DoubleType) / count(lit(1))).as("mean_val"))
    perPart.crossJoin(broadcast(mean))
      .where(col("val_dec").cast(DoubleType) > lit(1.3) * col("mean_val"))
      .select(col("l_partkey"), col("val_dec").cast(DoubleType).as("part_value"))
  }

  /** Q13-style customer order-count distribution: left join survives
    * zero-order customers, then a second aggregation over the counts. */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .where(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** Q15-style top supplier: per-supplier revenue in a quarter, keep the
    * max via a one-row broadcast (exact decimal revenue makes the equality
    * safe). */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    // the global max is a scalar tree-aggregate broadcast back as one row
    // (an empty-partition window would single-reduce all per-supplier
    // rows); the per-supplier aggregation is shared by both branches via
    // ReusedExchange, so lineitem is still scanned once
    val perSupp = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType)
        && col("l_shipdate") < lit("1997-07-01").cast(TimestampType))
      .groupBy(col("l_suppkey"))
      .agg(dsum(rev).as("total_rev"))
    val revenue = perSupp
      .crossJoin(broadcast(perSupp.agg(max(col("total_rev")).as("max_rev"))))
      .where(col("total_rev") === col("max_rev"))
    Tables.supplier(spark, dir)
      .join(revenue, col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
  }

  /** Q16-style supplier counts: distinct suppliers per part attribute
    * combo, excluding flagged suppliers — NOT IN as a left-anti join
    * (safe here: s_suppkey is non-null). */
  def q16SupplierCount(spark: SparkSession, dir: String): DataFrame = {
    val flagged = Tables.supplier(spark, dir)
      .where(col("s_acctbal") < 0.0).select(col("s_suppkey"))
    val parts = Tables.part(spark, dir)
      .where(col("p_brand") =!= "Brand#1"
        && !col("p_type").like("ECONOMY%")
        && col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 49))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(flagged, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** Q17-style small-quantity revenue: lineitems under 20% of their part's
    * average quantity — the correlated AVG rewritten as a grouped agg
    * joined back on partkey. */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    // the correlated AVG as a windowed exact average over the partkey
    // partition — one scan, one shuffle (grouped-agg + join-back scans
    // lineitem twice); same decimal-sum arithmetic as Dsl.davg
    val w = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(spark, dir)
      .withColumn("qty_limit",
        lit(0.2) * (sum(Dsl.money(col("l_quantity"))).over(w).cast(DoubleType)
          / count(col("l_quantity")).over(w)))
      .join(broadcast(Tables.part(spark, dir).where(col("p_brand") === "Brand#3")),
        col("l_partkey") === col("p_partkey"))
      .where(col("l_quantity") < col("qty_limit"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  /** Q12-style shipping-status priority counts: among late lineitems
    * (shipped > 60 days after order), high- vs low-priority order counts
    * per line status — conditional aggregation over one broadcast join.
    * l_linestatus stands in for the shipmode column the testdata lacks. */
  def q12ShipStatus(spark: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(high, 1).otherwise(0)).as("high_line_count"),
        sum(when(high, 0).otherwise(1)).as("low_line_count"))
  }

  /** Q20-style dominant suppliers: suppliers shipping more than twice
    * their fair share of a small part's quantity — the correlated
    * share-of-total rewritten as per-(part,supplier) vs per-part grouped
    * sums joined on partkey; two co-partitioned shuffles, dims broadcast.
    * The threshold is fair-share-relative (2 × total/n_suppliers) so
    * selectivity survives any scale factor. */
  def q20DominantSupplier(spark: SparkSession, dir: String): DataFrame = {
    // per-part totals as an unbounded window over the already-aggregated
    // rows — one pass; a grouped-agg + join-back would re-execute the
    // per-(part,supplier) subtree for the totals branch
    val w = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(dsumDec(col("l_quantity")).as("qty_ps"))
      .withColumn("qty_total", sum(col("qty_ps")).over(w))
      .withColumn("n_supp", count(lit(1)).over(w))
      .where(col("qty_ps").cast(DoubleType)
        > lit(2.0) * col("qty_total").cast(DoubleType) / col("n_supp"))
      .join(broadcast(Tables.part(spark, dir).where(col("p_size") < 15)),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_dominant_parts"))
  }

  /** Q21-style sole late shipper: suppliers who were the only late shipper
    * on multi-supplier orders. The textbook EXISTS / NOT-EXISTS pair (kept
    * verbatim in the oracle) is rewritten distributively: one grouped pass
    * per (order, supplier) for lateness, one per order for supplier/late
    * counts, then a filter — two shuffles on orderkey, no correlated
    * execution. */
  def q21SoleLateShipper(spark: SparkSession, dir: String): DataFrame = {
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
    val perOrderSupp = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(late, 1).otherwise(0)).as("is_late"))
    // per-order supplier/late counts as an unbounded window over the
    // already-aggregated rows — one pass, no join-back (a grouped-agg +
    // self-join would re-execute the whole scan subtree for each branch)
    val w = Window.partitionBy(col("l_orderkey"))
    perOrderSupp
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late", sum(col("is_late")).over(w))
      .where(col("is_late") === 1 && col("n_supp") > 1 && col("n_late") === 1)
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
  }

  object oracle {
    val q2MinCostSupplier: String =
      s"""WITH up AS (
         |  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_price
         |  FROM lineitem)
         |SELECT DISTINCT p_partkey, p_name, s_name, unit_price AS min_unit
         |FROM up
         |JOIN part ON p_partkey = l_partkey
         |JOIN supplier ON s_suppkey = l_suppkey
         |WHERE p_size < 20
         |  AND unit_price = (SELECT MIN(u2.unit_price) FROM up u2
         |                    WHERE u2.l_partkey = up.l_partkey)""".stripMargin

    val q8MarketShare: String =
      s"""SELECT CAST(year(o_orderdate) AS INT) AS yr,
         |  ${Dsl.sql.dsum("CASE WHEN sn.n_name = 'NATION_3' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
         |    / ${Dsl.sql.dsum("l_extendedprice * (1.0 - l_discount)")} AS mkt_share,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |JOIN region   ON cn.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |WHERE r_name = 'AMERICA'
         |GROUP BY 1""".stripMargin

    val q9ProductProfit: String =
      s"""SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS yr,
         |  ${Dsl.sql.dsum("l_extendedprice * (1.0 - l_discount)")} AS profit,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN part     ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation   ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%widget%'
         |GROUP BY 1, 2""".stripMargin

    val q11ImportantParts: String =
      s"""WITH v AS (
         |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS val_dec
         |  FROM lineitem GROUP BY 1)
         |SELECT l_partkey, CAST(val_dec AS DOUBLE) AS part_value
         |FROM v
         |WHERE CAST(val_dec AS DOUBLE) >
         |  1.3 * (SELECT CAST(SUM(val_dec) AS DOUBLE) / COUNT(*) FROM v)""".stripMargin

    val q13CustDist: String =
      s"""WITH c_orders AS (
         |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
         |  FROM customer
         |  LEFT JOIN orders ON c_custkey = o_custkey
         |    AND o_orderpriority <> '1-URGENT'
         |  GROUP BY 1)
         |SELECT c_count, COUNT(*) AS custdist
         |FROM c_orders GROUP BY 1""".stripMargin

    val q15TopSupplier: String =
      s"""WITH revenue AS (
         |  SELECT l_suppkey, ${Dsl.sql.dsum("l_extendedprice * (1.0 - l_discount)")} AS total_rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |    AND l_shipdate <  TIMESTAMP '1997-07-01'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, total_rev
         |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
         |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)""".stripMargin

    val q16SupplierCount: String =
      s"""SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |WHERE p_brand <> 'Brand#1'
         |  AND p_type NOT LIKE 'ECONOMY%'
         |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 49)
         |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
         |GROUP BY 1, 2, 3""".stripMargin

    val q17SmallQuantity: String =
      s"""WITH pa AS (
         |  SELECT l_partkey, 0.2 * (${Dsl.sql.davg("l_quantity")}) AS qty_limit
         |  FROM lineitem GROUP BY 1)
         |SELECT ${Dsl.sql.dsum("l_extendedprice")} / 7.0 AS avg_yearly,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN pa USING (l_partkey)
         |JOIN part ON l_partkey = p_partkey
         |WHERE p_brand = 'Brand#3' AND l_quantity < qty_limit""".stripMargin

    val q12ShipStatus: String =
      s"""SELECT l_linestatus,
         |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
         |GROUP BY 1""".stripMargin

    /** Textbook correlated share-of-total form. */
    val q20DominantSupplier: String =
      s"""WITH ps AS (
         |  SELECT l_partkey, l_suppkey,
         |    SUM(CAST(l_quantity AS DECIMAL(18,6))) AS qty_ps
         |  FROM lineitem GROUP BY 1, 2)
         |SELECT s_suppkey, s_name, COUNT(*) AS n_dominant_parts
         |FROM ps
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |WHERE p_size < 15
         |  AND CAST(qty_ps AS DOUBLE) > 2.0 * (
         |    SELECT CAST(SUM(qty_ps) AS DOUBLE) / COUNT(*) FROM ps p2
         |    WHERE p2.l_partkey = ps.l_partkey)
         |GROUP BY 1, 2""".stripMargin

    /** Textbook correlated EXISTS / NOT EXISTS form — the comparison also
      * checks the Spark side's distributed rewrite is equivalent. */
    val q21SoleLateShipper: String =
      s"""SELECT s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
         |FROM lineitem l1
         |JOIN orders   ON l1.l_orderkey = o_orderkey
         |JOIN supplier ON l1.l_suppkey = s_suppkey
         |WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
         |  AND EXISTS (SELECT 1 FROM lineitem l2
         |              WHERE l2.l_orderkey = l1.l_orderkey
         |                AND l2.l_suppkey <> l1.l_suppkey)
         |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
         |                  WHERE l3.l_orderkey = l1.l_orderkey
         |                    AND l3.l_suppkey <> l1.l_suppkey
         |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
         |GROUP BY 1""".stripMargin
  }
}

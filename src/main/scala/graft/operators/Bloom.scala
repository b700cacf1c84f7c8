package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Dsl, Tables}

/** Bloom-filter semi-join pruning — the runtime-filter pattern a 100 TB
  * fact⋈dim join needs when the dim's key set is too large to ship as an
  * exact broadcast hash set but its BLOOM BITS are not: build the filter
  * distributed on the dim side, broadcast the (tiny) bit table, probe the
  * fact map-only, and let the exact join afterwards drop the false
  * positives. Spark's own `runtime.bloomFilter` rewrite plans exactly
  * this shape; here it is explicit, engine-portable (md5 double hashing,
  * mirrored verbatim in the DuckDB oracle — the FILTER ITSELF is
  * hash-compared, not just the exact result), and auditable: the output
  * carries candidate vs exact counts per group, so the pruning rate is
  * visible.
  *
  * Scale design:
  *  - build: one hash aggregate over the dim keys (k positions per key →
  *    `bit_or` per 32-bit word) — output is `mBits/32` rows regardless of
  *    dim size;
  *  - probe: a pure boolean expression over a literal word array, pushed
  *    into the fact SCAN as a data filter — map-only, fully codegen, the
  *    fact NEVER shuffles (or even leaves the scan stage) to be filtered;
  *  - verify: the exact dim join runs only on bloom survivors.
  *
  * Sizing: fp ≈ (1 − e^(−k·n/m))^k; m = 1.44·n·log2(1/p) bits for target
  * p. The defaults (m=4096, k=3) give p < 1% for the ~200-key dim here;
  * at 100 TB both scale linearly in the dim key count (a 10 M-key dim at
  * p=1% is ~17 MB of bits — still broadcastable where a 10 M-entry exact
  * hash set may not be).
  *
  * Words are 32-bit (stored in BIGINT) so shift arithmetic stays
  * sign-free and identical in both engines.
  */
object Bloom {

  /** Bloom bit positions for a key column: double hashing
    * pos_i = (h1 + i·h2) mod m (Kirsch–Mitzenmacher: two base hashes
    * simulate k independent ones). Both bases come from ONE md5 — the
    * digest carries 128 bits and each base consumes 60 (hex chars 1-15
    * and 16-30) — so the probe costs a single hash per row. */
  private def md5hex(key: Column): Column =
    md5(concat(lit("bf_"), key.cast(StringType)))
  private def hexLong(hex: Column, from: Int): Column =
    conv(substring(hex, from, 15), 16, 10).cast(LongType)
  private def h1(hex: Column, mBits: Int): Column =
    pmod(hexLong(hex, 1), lit(mBits.toLong))
  private def h2(hex: Column, mBits: Int): Column =
    lit(1L) + pmod(hexLong(hex, 16), lit((mBits - 1).toLong))

  /** Build the word table (word index → 32-bit mask as BIGINT) for a key
    * frame. ≤ mBits/32 rows — broadcastable at any dim size. */
  def buildBits(keys: DataFrame, keyCol: String, mBits: Int, k: Int): DataFrame =
    keys
      .select(md5hex(col(keyCol)).as("hx"))
      .select(h1(col("hx"), mBits).as("h1"), h2(col("hx"), mBits).as("h2"))
      .select(explode(sequence(lit(0L), lit(k - 1L))).as("i"), col("h1"), col("h2"))
      .select(pmod(col("h1") + col("i") * col("h2"), lit(mBits.toLong)).as("pos"))
      .groupBy(expr("pos div 32").as("w"))
      .agg(bit_or(expr("shiftleft(1L, cast(pos % 32 as int))")).as("bits"))

  /** [[buildBits]] pulled to the driver as a dense word array — the
    * bounded (mBits/32 longs, data-size-independent) pull that feeds the
    * literal probe. */
  def bitsArray(keys: DataFrame, keyCol: String, mBits: Int, k: Int): Array[Long] = {
    val words = new Array[Long](mBits / 32)
    buildBits(keys, keyCol, mBits, k).collect()
      .foreach(r => words(r.getAs[Long]("w").toInt) = r.getAs[Long]("bits"))
    words
  }

  /** Membership test of a key column against a dense word array: a native
    * codegen expression ([[graft.functions.Native.BloomContains]]) doing
    * ONE md5 per row and k inline bit tests. A plain boolean expression,
    * so Catalyst pushes it all the way into the fact SCAN (a DataFilter) —
    * the fact side is pruned before any join. (The declarative k-term
    * conjunction re-evaluated the md5 chain per term: FilterExec splits
    * conjunctions without cross-term subexpression sharing.) */
  def mightContain(key: Column, words: Array[Long], mBits: Int, k: Int): Column =
    graft.functions.Native.bloom_contains(
      concat(lit("bf_"), key.cast(StringType)), words, mBits, k)

  /** Revenue by return flag for lineitems of suppliers in one region,
    * computed through the bloom-prune → exact-verify pipeline. Output per
    * flag: `n_candidates` (rows passing the bloom probe, false positives
    * included), `n_exact` (rows surviving the exact dim join) and the
    * exact revenue — `n_candidates ≥ n_exact` always, and the gap is the
    * false-positive audit.
    *
    * The filter bits are built distributed ([[buildBits]]) and pulled to
    * the driver as ONE array of `mBits/32` longs — bounded by a chosen
    * constant, independent of data size (the same bounded-driver-pull
    * budget as the watermark scalar in silver_incremental). Embedded as a
    * literal, the probe becomes a scan-level filter: zero joins touch the
    * unpruned fact, exactly the plan Spark's own `runtime.bloomFilter`
    * rewrite injects (BloomFilterMightContain over a scalar subquery).
    * For filters too large to ship as a literal (≥ ~1 M bits) the probe
    * degrades gracefully to a broadcast join against the word table —
    * [[buildBits]] output is that table. */
  def bloomPruneJoin(spark: SparkSession, dir: String, region: String = "ASIA",
                     mBits: Int = 4096, k: Int = 3): DataFrame = {
    val dim = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === region)
      .select(col("s_suppkey"))
    val words = bitsArray(dim, "s_suppkey", mBits, k)

    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_returnflag"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .where(mightContain(col("l_suppkey"), words, mBits, k))
      .join(broadcast(dim.withColumn("hit", lit(1))),
        col("l_suppkey") === col("s_suppkey"), "left")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_candidates"),
        count(col("hit")).as("n_exact"),
        Dsl.dsum(when(col("hit").isNotNull, col("rev"))).as("revenue_exact"))
  }

  object oracle {
    def bloomPruneJoin(region: String = "ASIA", mBits: Int = 4096, k: Int = 3): String = {
      def h1(hx: String) = s"(CAST(('0x' || substr($hx, 1, 15)) AS BIGINT) % $mBits)"
      def h2(hx: String) = s"(1 + CAST(('0x' || substr($hx, 16, 15)) AS BIGINT) % ${mBits - 1})"
      val probes = (0 until k).map(i =>
        s"LEFT JOIN words w$i ON w$i.w = f.p$i // 32").mkString("\n         |  ")
      val candidate = (0 until k).map(i =>
        s"w$i.bits IS NOT NULL AND ((w$i.bits >> (f.p$i % 32)) & 1) = 1").mkString("\n         |    AND ")
      s"""WITH dim AS (
         |  SELECT s_suppkey FROM supplier
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = '$region'),
         |dh AS (SELECT s_suppkey, md5('bf_' || s_suppkey) AS hx FROM dim),
         |pos AS (
         |  SELECT (${h1("hx")} + i * ${h2("hx")}) % $mBits AS pos
         |  FROM dh, range($k) t(i)),
         |words AS (
         |  SELECT pos // 32 AS w, bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
         |  FROM pos GROUP BY 1),
         |fact AS (
         |  SELECT l_suppkey, l_returnflag,
         |    l_extendedprice * (1.0 - l_discount) AS rev,
         |    ${h1("md5('bf_' || l_suppkey)")} AS h1, ${h2("md5('bf_' || l_suppkey)")} AS h2
         |  FROM lineitem),
         |fpos AS (
         |  SELECT *, ${(0 until k).map(i => s"(h1 + $i * h2) % $mBits AS p$i").mkString(", ")}
         |  FROM fact),
         |cand AS (
         |  SELECT f.l_suppkey, f.l_returnflag, f.rev
         |  FROM fpos f
         |  $probes
         |  WHERE $candidate)
         |SELECT c.l_returnflag,
         |  COUNT(*) AS n_candidates,
         |  COUNT(d.s_suppkey) AS n_exact,
         |  ${Dsl.sql.dsum("CASE WHEN d.s_suppkey IS NOT NULL THEN c.rev END")} AS revenue_exact
         |FROM cand c LEFT JOIN dim d ON c.l_suppkey = d.s_suppkey
         |GROUP BY 1""".stripMargin
    }
  }
}

package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared expression helpers.
  *
  * Reproducibility policy: the driver hash-compares our results against a
  * DuckDB oracle, so every aggregated double must be **bit-identical**
  * across engines. Double summation is accumulation-order dependent (and
  * Spark's partitioning makes the order nondeterministic), so all sums of
  * monetary/double columns are computed over `DECIMAL(18,6)` casts — exact
  * and order-independent — and only cast back to double at the end.
  * Ratios (avg, stddev) are then derived from the exact sums with a fixed
  * IEEE-754 double expression tree that the oracle SQL mirrors verbatim.
  */
object Dsl {
  /** Exact intermediate type for money-ish doubles (testdata values are
    * 2-decimal; 6 fractional digits is comfortably lossless). */
  val Money: DecimalType = DecimalType(18, 6)

  /** `c.cast(Money)` with the per-row `Double.toString`+BigDecimal-parse
    * tax removed: [[graft.functions.Native.ToScaledDecimal]] produces the
    * SAME decimal values (property-checked against the cast in
    * NativeDecSpec) through compact-long arithmetic. The cast was the
    * single hottest scalar in every decimal-sum aggregate (JDK 17 pre-Ryū
    * dtoa, one per summed row). */
  def money(c: Column): Column = graft.functions.Native.to_dec(c, 18, 6)

  /** Order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(money(c)).cast(DoubleType)

  /** Order-independent sum kept as decimal (for further exact math). */
  def dsumDec(c: Column): Column = sum(money(c))

  /** Mean derived from the exact sum; denominator mirrors SQL AVG null
    * semantics (count of non-null inputs). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Sample standard deviation from exact sums:
    * sqrt(max((s2 - s1^2/n) / (n-1), 0)), rounded to 6 decimals. The
    * exact decimal sums make the expression engine-independent up to the
    * decimal→double cast; that cast double-rounds in DuckDB when the
    * scaled int128 exceeds 2^53 (s2 sums do), leaving ulp-level noise the
    * final rounding absorbs. (Builtin STDDEV would differ far more —
    * different accumulation algorithm and order.)
    */
  def dstddev(c: Column): Column = {
    val n  = count(c)
    val s1 = sum(money(c)).cast(DoubleType)
    val s2 = sum((money(c) * money(c))).cast(DoubleType)
    round(when(n > 1, sqrt(greatest((s2 - s1 * s1 / n) / (n - lit(1)), lit(0.0)))), 6)
  }

  /** The matching oracle-SQL fragments (DuckDB dialect = ANSI). Keeping
    * them next to the Scala definitions makes drift harder. */
  object sql {
    def dsum(x: String): String =
      s"CAST(SUM(CAST(($x) AS DECIMAL(18,6))) AS DOUBLE)"
    def davg(x: String): String =
      s"${dsum(x)} / COUNT($x)"
    def dstddev(x: String): String = {
      val s1 = dsum(x)
      // DECIMAL(19,6): DuckDB stores ≤18-digit decimals in int64 and its
      // multiply overflows before widening; 19 digits forces the int128
      // path. Values are identical to the Spark side's (18,6)² products.
      val s2 = s"CAST(SUM(CAST(($x) AS DECIMAL(19,6)) * CAST(($x) AS DECIMAL(19,6))) AS DOUBLE)"
      s"round(CASE WHEN COUNT($x) > 1 THEN sqrt(greatest(($s2 - $s1 * $s1 / COUNT($x)) / (COUNT($x) - 1), 0.0)) ELSE NULL END, 6)"
    }
  }
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Native

/** Bit-equivalence of the fast decimal kernels against the Spark
  * expressions they replace. The contract is EXACT value identity —
  * these kernels sit under oracle-hash-compared aggregates, so a single
  * divergent ulp anywhere fails the round. Adversarial cases target the
  * fast path's rounding-boundary guard: exact half-points at the target
  * scale, their double neighbors, huge/tiny magnitudes where the margin
  * test must self-disable. */
class NativeDecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def adversarial: Seq[Double] = {
    val rng = new scala.util.Random(7)
    val halves6 = (0 until 20000).map { _ =>
      // k + 0.5 at scale 6: the HALF_UP boundary for DECIMAL(_,6)
      (rng.nextLong(math.abs(rng.nextInt(2000000000) + 1L)) + 0.5) / 1e6 *
        (if (rng.nextBoolean()) 1 else -1)
    }
    val halves12 = (0 until 20000).map { _ =>
      (rng.nextInt(1000000).toLong + 0.5) / 1e12 * (if (rng.nextBoolean()) 1 else -1)
    }
    val neighbors = halves6.take(5000).flatMap(d =>
      Seq(Math.nextUp(d), Math.nextDown(d)))
    val magnitudes = (-320 to 300).map(e => math.pow(10, e / 10.0)) ++
      (0 to 62).map(b => math.pow(2, b) + 0.5) ++
      Seq(0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue)
    halves6 ++ halves12 ++ neighbors ++ magnitudes
  }

  private def randoms(n: Int): Seq[Double] = {
    val rng = new scala.util.Random(42)
    (0 until n).map { _ =>
      val m = rng.nextInt(30) - 15
      (rng.nextDouble() - 0.5) * math.pow(10, m)
    }
  }

  test("to_dec(18,6) equals cast(DECIMAL(18,6)) over random + adversarial doubles") {
    val vals = (randoms(300000) ++ adversarial).filter(d => math.abs(d) < 1e11)
    val df = vals.toDF("d")
      .select(col("d").cast(DecimalType(18, 6)).as("c"),
        Native.to_dec(col("d"), 18, 6).as("n"))
    assert(df.where(col("c") =!= col("n") ||
      col("c").isNull =!= col("n").isNull).count() === 0)
  }

  test("to_dec(18,12) equals cast(DECIMAL(18,12)) over random + adversarial doubles") {
    val vals = (randoms(300000) ++ adversarial).filter(d => math.abs(d) < 1e5)
    val df = vals.toDF("d")
      .select(col("d").cast(DecimalType(18, 12)).as("c"),
        Native.to_dec(col("d"), 18, 12).as("n"))
    assert(df.where(col("c") =!= col("n") ||
      col("c").isNull =!= col("n").isNull).count() === 0)
  }

  test("to_dec float child equals cast") {
    val rng = new scala.util.Random(3)
    val vals = (0 until 100000).map(_ => ((rng.nextFloat() - 0.5f) * 1e4f))
    val df = vals.toDF("f")
      .select(col("f").cast(DecimalType(18, 6)).as("c"),
        Native.to_dec(col("f"), 18, 6).as("n"))
    assert(df.where(col("c") =!= col("n")).count() === 0)
  }

  /** The fold ExactDotDecimal replaces, verbatim from Similarity. */
  private def oldZipSum(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val Acc = DecimalType(30, 12)
    val Term = DecimalType(20, 12)
    aggregate(
      zip_with(a, b, (x, y) => (x.cast(DoubleType) * y.cast(DoubleType)).cast(Term)),
      lit(BigDecimal(0)).cast(Acc),
      (acc, z) => (acc + z).cast(Acc)).cast(DoubleType)
  }

  test("exact_dot_decimal equals the aggregate/zip_with fold on random float arrays") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 4000).map { _ =>
      val dim = 64
      (Array.fill(dim)((rng.nextDouble() - 0.5).toFloat * 2f),
        Array.fill(dim)((rng.nextDouble() - 0.5).toFloat * 2f))
    }
    val df = rows.toDF("a", "b")
      .select(oldZipSum(col("a"), col("b")).as("o"),
        Native.exact_dot_decimal(col("a"), col("b")).as("n"))
    // compare raw 64-bit images: NaN-safe, ulp-exact
    val bad = df.where(
      (col("o").isNull =!= col("n").isNull) ||
        expr("o <> n")).count()
    assert(bad === 0)
  }

  test("exact_dot_decimal edge shapes: empty, mismatch, null element, NaN, big values") {
    val mk = (xs: Seq[java.lang.Float]) => xs
    val rows = Seq(
      (Seq.empty[java.lang.Float], Seq.empty[java.lang.Float]),
      (mk(Seq(1f, 2f)), mk(Seq(1f))),                       // length mismatch
      (mk(Seq(1f, null)), mk(Seq(1f, 2f))),                 // null element
      (mk(Seq(Float.NaN, 1f)), mk(Seq(1f, 1f))),            // NaN product
      (mk(Seq(Float.PositiveInfinity)), mk(Seq(1f)))        // Inf product
    )
    val df = rows.toDF("a", "b")
      .select(oldZipSum(col("a"), col("b")).as("o"),
        Native.exact_dot_decimal(col("a"), col("b")).as("n"))
    val bad = df.where(
      (col("o").isNull =!= col("n").isNull) || expr("o <> n")).count()
    assert(bad === 0)
    // term beyond DECIMAL(20,12): both forms throw (ANSI cast semantics)
    val big = Seq((mk(Seq(3.4e18f)), mk(Seq(3.4e18f)))).toDF("a", "b")
    intercept[Exception] { big.select(oldZipSum(col("a"), col("b"))).collect() }
    intercept[Exception] {
      big.select(Native.exact_dot_decimal(col("a"), col("b"))).collect() }
    // sum overflowing the scaled-long accumulator but inside DECIMAL(30,12):
    // values agree through the BigDecimal re-run (4e6 * 64 ≈ 2.6e8 < 1e18)
    val mid = Seq((mk(Seq.fill(64)(2000f)), mk(Seq.fill(64)(2000f)))).toDF("a", "b")
    val r = mid.select(oldZipSum(col("a"), col("b")).as("o"),
      Native.exact_dot_decimal(col("a"), col("b")).as("n")).collect()(0)
    assert(r.getDouble(0) === r.getDouble(1))
  }
}

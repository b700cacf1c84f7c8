package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge => B}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions with full codegen — the hot-path scalar
  * kernels where Spark's built-ins fall short:
  *
  *  - `RollingHash`: 64-bit polynomial (Rabin-Karp) content fingerprint of
  *    a string. Built-in alternatives hash whole UTF8 blobs (xxhash64) —
  *    fine — but a polynomial hash supports incremental/windowed hashing
  *    downstream and demonstrates the Expression + doGenCode path.
  *  - `FloatCosine`: cosine similarity of two float arrays in plain double
  *    arithmetic with a tight primitive loop. The `aggregate`/`zip_with`
  *    formulation in [[graft.operators.Similarity]] is exact-decimal (for
  *    oracle bit-reproducibility) but interpreted (~µs/row); this kernel is
  *    the throughput path for LSH/IVF candidate scoring at scale, where
  *    ulp-level reproducibility doesn't change bucketing decisions.
  *
  * Both are null-intolerant (null in → null out) and codegen-friendly:
  * WholeStageCodegen inlines the generated loops into the surrounding
  * operator, so the scan→score pipeline stays in one JIT'd function.
  */
object Native {

  private val P = 1099511628211L // FNV-ish odd multiplier; any odd 64-bit works

  /** Input contract: child must be StringType (enforced by the Column API
    * wrappers below; AbstractDataType/ExpectsInputTypes are private[sql]). */
  case class RollingHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "rolling_hash"

    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[UTF8String].getBytes
      var h = 0L
      var i = 0
      while (i < bytes.length) { h = h * P + bytes(i); i += 1 }
      h
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val bytes = ctx.freshName("bytes")
        val i = ctx.freshName("i")
        s"""
           |byte[] $bytes = $c.getBytes();
           |long h = 0L;
           |for (int $i = 0; $i < $bytes.length; $i++) { h = h * ${P}L + $bytes[$i]; }
           |${ev.value} = h;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): RollingHash =
      copy(child = newChild)
  }

  /** Input contract: both children Array[Float]. */
  case class FloatCosine(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "float_cosine"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; nx += xi * xi; ny += yi * yi
        i += 1
      }
      val denom = math.sqrt(nx * ny)
      if (denom == 0.0) 0.0 else dot / denom
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        val xi = ctx.freshName("xi")
        val yi = ctx.freshName("yi")
        val denom = ctx.freshName("denom")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xi = (double) $a.getFloat($i);
           |  double $yi = (double) $b.getFloat($i);
           |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
           |}
           |double $denom = java.lang.Math.sqrt($nx * $ny);
           |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatCosine =
      copy(left = l, right = r)
  }

  /** Bloom-filter membership of a string key against a literal word array
    * (32-bit words in longs): ONE md5 per row, k double-hashed bit tests.
    *
    * Exists because the declarative formulation (k conjunction terms each
    * deriving positions from `conv(substring(md5 …))`) re-evaluates the
    * md5 chain per term — FilterExec splits conjunctive predicates and
    * does not share subexpressions across them (measured 7.4 s vs sub-
    * second at sf0.1). Semantics are bit-identical to that formulation
    * (and to the DuckDB oracle mirror): base hashes are hex chars 1-15
    * and 16-30 of the digest, positions are (h1 + i·h2) mod mBits.
    * Input contract: child is the already-prefixed key string. */
  case class BloomContains(child: Expression, words: Array[Long], mBits: Int, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_contains"

    override def nullSafeEval(input: Any): Any = {
      val hex = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(input.asInstanceOf[UTF8String].getBytes)
      val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16) % mBits
      val h2 = 1L + java.lang.Long.parseLong(hex.substring(15, 30), 16) % (mBits - 1)
      var i = 0
      while (i < k) {
        val pos = (h1 + i * h2) % mBits
        if (((words((pos >>> 5).toInt) >>> (pos & 31)) & 1L) == 0L) return false
        i += 1
      }
      true
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
      nullSafeCodeGen(ctx, ev, c => {
        val hex = ctx.freshName("hex")
        val h1 = ctx.freshName("h1")
        val h2 = ctx.freshName("h2")
        val pos = ctx.freshName("pos")
        val ok = ctx.freshName("ok")
        val i = ctx.freshName("i")
        s"""
           |String $hex = org.apache.commons.codec.digest.DigestUtils.md5Hex($c.getBytes());
           |long $h1 = java.lang.Long.parseLong($hex.substring(0, 15), 16) % ${mBits}L;
           |long $h2 = 1L + java.lang.Long.parseLong($hex.substring(15, 30), 16) % ${mBits - 1}L;
           |boolean $ok = true;
           |for (int $i = 0; $i < $k; $i++) {
           |  long $pos = ($h1 + $i * $h2) % ${mBits}L;
           |  if ((($wordsRef[(int) ($pos >>> 5)] >>> ($pos & 31)) & 1L) == 0L) { $ok = false; break; }
           |}
           |${ev.value} = $ok;
         """.stripMargin
      })
    }

    // Case-class equality on an Array field is reference identity, which
    // breaks plan canonicalization: two semantically identical probes
    // would never compare equal (semanticEquals, subexpression
    // elimination, exchange reuse all miss). Compare the bit content.
    override def equals(other: Any): Boolean = other match {
      case b: BloomContains =>
        b.child == child && b.mBits == mBits && b.k == k &&
          java.util.Arrays.equals(b.words, words)
      case _ => false
    }
    override def hashCode(): Int =
      java.util.Objects.hash(child, Integer.valueOf(mBits), Integer.valueOf(k),
        Integer.valueOf(java.util.Arrays.hashCode(words)))

    override protected def withNewChildInternal(newChild: Expression): BloomContains =
      copy(child = newChild)
  }

  /** Word n-gram (shingle) generator: one input text row → one output row
    * per n-token window, entirely WITHIN the input row's partition.
    *
    * Exists because the declarative formulation (posexplode tokens →
    * window lead(1..n-1) over (doc_id, pos)) needs a Window, and a window
    * partitioned by doc_id SHUFFLES the corpus × tokens rows before a
    * single shingle is formed — pure cost, since shingling is row-local.
    * As a Generator the shingles materialize map-side and the downstream
    * signature aggregate's partial step collapses them to one row per doc
    * before anything moves. Tokenization matches `split(text, ' ')`
    * (single-space split, empties kept) so outputs are byte-identical to
    * the window form and the DuckDB oracle mirrors.
    *
    * CodegenFallback: custom generators run interpreted inside
    * GenerateExec; the per-row work (one split + slicing) is trivial next
    * to the shuffle it removes. */
  case class ShingleGenerate(child: Expression, n: Int)
      extends UnaryExpression with Generator with CodegenFallback {
    require(n >= 1, "shingle width must be positive")
    override def elementSchema: StructType =
      StructType(StructField("s", StringType) :: Nil)
    override def prettyName: String = "shingle_rows"

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val v = child.eval(input)
      if (v == null) Nil
      else {
        val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
        if (toks.length < n) Nil
        else (0 to toks.length - n).map { i =>
          InternalRow(UTF8String.fromString(
            toks.view.slice(i, i + n).mkString(" ")))
        }
      }
    }

    override protected def withNewChildInternal(newChild: Expression): ShingleGenerate =
      copy(child = newChild)
  }

  /** Fast double→scaled-long with EXACTLY the value of Spark's
    * `Cast(double AS DECIMAL(_, scale))`: `BigDecimal.valueOf(d)` (the
    * SHORTEST decimal representation of the double) rounded HALF_UP at
    * `scale`. The cast pays `Double.toString` (pre-Ryū on JDK 17) plus a
    * BigDecimal parse PER ROW — measured 55% of ANN task CPU and the
    * dominant cost of every decimal-sum aggregate. Fast path: one double
    * multiply + floor, taken only when the scaled value is provably
    * farther from a HALF_UP rounding boundary than the combined
    * double-arithmetic error (≤ 0.5 ulp from the multiply) and
    * shortest-repr displacement (≤ ~2 ulp); the margin test
    * self-disables (branches unsatisfiable) when ulp grows past the
    * boundary gap near 2^53, falling back to the exact path. The
    * fallback IS `BigDecimal.valueOf` — bit-for-bit the cast's value —
    * and NativeDecSpec property-checks the equivalence against Spark's
    * own Cast over randomized magnitudes. Throws on non-finite input
    * and on > 18-digit results (ANSI cast semantics; a compact decimal
    * could not hold them either). */
  def toScaledLong(d: Double, pow: Double, scale: Int): Long = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
      throw new ArithmeticException(s"cannot cast $d to a scaled decimal")
    val a = math.abs(d)
    val y = a * pow
    if (y < 9.007199254740992e15) { // < 2^53: floor and f = y-k are exact
      val k = math.floor(y)
      val f = y - k
      val margin = math.max(1e-6, 8 * Math.ulp(y))
      if (f > 0.5 + margin) { val r = k.toLong + 1L; return if (d < 0) -r else r }
      if (f < 0.5 - margin) { val r = k.toLong; return if (d < 0) -r else r }
    }
    java.math.BigDecimal.valueOf(d)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  }

  private val Pow10: Array[Double] = (0 to 18).map(i => math.pow(10, i)).toArray
  private val LongPow10: Array[Long] = (0 to 18).map(i => math.pow(10, i).toLong).toArray

  /** `Decimal(p, s)` twin of `child.cast(DecimalType(p, s))` for a DOUBLE
    * or FLOAT child — same values ([[toScaledLong]]), no per-row
    * Double.toString. Restricted to p ≤ 18 (compact long decimals) and
    * throws on overflow, mirroring the ANSI cast the engine runs under. */
  case class ToScaledDecimal(child: Expression, precision: Int, scale: Int)
      extends UnaryExpression {
    require(precision <= 18 && scale >= 0 && scale <= precision,
      s"ToScaledDecimal supports compact decimals only, got ($precision,$scale)")
    override def dataType: DataType = DecimalType(precision, scale)
    override def prettyName: String = s"to_dec_${precision}_$scale"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case DoubleType | FloatType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"to_dec needs a double/float child, got $other")
      }
    private lazy val isFloat = child.dataType == FloatType

    override def nullSafeEval(v: Any): Any = {
      val d = if (isFloat) v.asInstanceOf[Float].toDouble else v.asInstanceOf[Double]
      Native.toDecimal(d, precision, scale)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val cd = if (isFloat) s"(double) $c" else c
        s"${ev.value} = graft.functions.Native.toDecimal($cd, $precision, $scale);"
      })

    override protected def withNewChildInternal(newChild: Expression): ToScaledDecimal =
      copy(child = newChild)
  }

  /** Static kernel behind [[ToScaledDecimal]] (codegen calls it). */
  def toDecimal(d: Double, precision: Int, scale: Int): org.apache.spark.sql.types.Decimal = {
    val unscaled = toScaledLong(d, Pow10(scale), scale)
    if (math.abs(unscaled) >= LongPow10(precision))
      throw new ArithmeticException(
        s"$d does not fit DECIMAL($precision,$scale)")
    org.apache.spark.sql.types.Decimal.createUnsafe(unscaled, precision, scale)
  }

  /** The whole `exactZipSum` fold as one kernel: for two float/double
    * arrays, sum of per-element products each rounded to DECIMAL scale 12
    * (the [[graft.operators.Similarity]] contract), returned as the
    * DOUBLE the fold's final cast produced. Null/shape semantics mirror
    * the `aggregate(zip_with(...))` form exactly: length mismatch
    * (zip_with pads with nulls), any null element, or a non-finite
    * product → null; empty arrays → 0.0. Terms accumulate as scaled
    * longs (exact — the decimal adds were exact too); the final double
    * is produced through the same BigDecimal→double conversion the
    * decimal cast used. Long overflow (|sum| ≥ 10^6.9 in value — beyond
    * any dot product of sane embeddings) recomputes the pair through
    * full BigDecimal arithmetic rather than failing. */
  case class ExactDotDecimal(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "exact_dot_decimal"
    private def elemIsFloat(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case ArrayType(DoubleType, _) => false
      case other => throw new IllegalStateException(
        s"exact_dot_decimal needs array<float|double>, got $other")
    }
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"exact_dot_decimal needs array<float|double> inputs, got " +
          s"${left.dataType} / ${right.dataType}")
    }
    private lazy val lf = elemIsFloat(left)
    private lazy val rf = elemIsFloat(right)

    override def nullSafeEval(a: Any, b: Any): Any =
      Native.exactDotDec(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lf, rf)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val r = ctx.freshName("dot")
        s"""
           |java.lang.Double $r = graft.functions.Native.exactDotDec($a, $b, $lf, $rf);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): ExactDotDecimal =
      copy(left = l, right = r)
  }

  /** Static kernel behind [[ExactDotDecimal]]; boxed so codegen can see
    * the null verdict. */
  def exactDotDec(x: ArrayData, y: ArrayData,
                  leftFloat: Boolean, rightFloat: Boolean): java.lang.Double = {
    val n = x.numElements()
    if (y.numElements() != n) return null // zip_with pads → null terms → null
    var sum = 0L
    var i = 0
    var overflow = false
    while (i < n && !overflow) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xd = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yd = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xd * yd
      if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return null
      try sum = Math.addExact(sum, toScaledLong(d, 1e12, 12))
      catch { case _: ArithmeticException => overflow = true }
      i += 1
    }
    if (overflow) {
      // exact re-run of the whole pair in BigDecimal space with the
      // fold's own overflow contract: a term beyond DECIMAL(20,12) or an
      // accumulator beyond DECIMAL(30,12) throws, as the ANSI casts did —
      // unreachable for unit-ish vectors, faithful for adversarial ones
      val termLimit = new java.math.BigDecimal(java.math.BigInteger.TEN.pow(8))
      val accLimit = new java.math.BigDecimal(java.math.BigInteger.TEN.pow(18))
      var acc = java.math.BigDecimal.ZERO
      var j = 0
      while (j < n) {
        val xd = if (leftFloat) x.getFloat(j).toDouble else x.getDouble(j)
        val yd = if (rightFloat) y.getFloat(j).toDouble else y.getDouble(j)
        val d = xd * yd
        if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return null
        val t = java.math.BigDecimal.valueOf(d)
          .setScale(12, java.math.RoundingMode.HALF_UP)
        if (t.abs.compareTo(termLimit) >= 0)
          throw new ArithmeticException(s"$d does not fit DECIMAL(20,12)")
        acc = acc.add(t)
        if (acc.abs.compareTo(accLimit) >= 0)
          throw new ArithmeticException(s"$acc does not fit DECIMAL(30,12)")
        j += 1
      }
      return java.lang.Double.valueOf(acc.doubleValue())
    }
    // same conversion the Decimal(…,12) → double cast performs
    java.lang.Double.valueOf(
      new java.math.BigDecimal(java.math.BigInteger.valueOf(sum), 12).doubleValue())
  }

  // Column-API entry points (classic Column <-> Expression bridge)
  def rolling_hash(c: Column): Column =
    B.column(RollingHash(B.expression(c)))
  def float_cosine(a: Column, b: Column): Column =
    B.column(FloatCosine(B.expression(a), B.expression(b)))
  def bloom_contains(keyStr: Column, words: Array[Long], mBits: Int, k: Int): Column =
    B.column(BloomContains(B.expression(keyStr), words, mBits, k))
  def shingle_rows(text: Column, n: Int): Column =
    B.column(ShingleGenerate(B.expression(text), n))
  def to_dec(c: Column, precision: Int, scale: Int): Column =
    B.column(ToScaledDecimal(B.expression(c), precision, scale))
  def exact_dot_decimal(a: Column, b: Column): Column =
    B.column(ExactDotDecimal(B.expression(a), B.expression(b)))
}

package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** The catalog's partition-transform functions, exposed through Spark's
  * [[org.apache.spark.sql.connector.catalog.FunctionCatalog]] so the
  * storage-partitioned-join planner can RESOLVE a reported
  * `bucket(n, col)` clustering (V2ExpressionUtils loads the function and
  * matches both join sides by `canonicalName` + bucket count) and, when
  * it needs to, EVALUATE it (shuffling a non-partitioned side into the
  * table's bucketing). The hash must stay bit-identical to the write
  * path's `pmod(hash(col), n)` — catalyst Murmur3, seed 42 — or a
  * shuffled side would land rows in the wrong buckets.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col) = pmod(murmur3_hash(col), n): the hidden bucket transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(0).dataType == IntegerType,
      s"bucket expects (numBuckets INT, key), got ${inputType.catalogString}")
    val keyType = inputType.fields(1).dataType
    keyType match {
      case IntegerType | LongType | DateType | TimestampType |
           TimestampNTZType | StringType => new GraftBucketBound(keyType)
      case other => throw new UnsupportedOperationException(
        s"bucket over ${other.catalogString} keys is not supported")
    }
  }
}

/** The `days` transform as a catalog function — lets the SPJ planner
  * resolve a reported `days(ts)` clustering over hidden-day layouts and
  * evaluate it when shuffling a plain side into the layout. Identical to
  * the writer's derivation: wall-clock day of the TIMESTAMP_NTZ (micros
  * floor-div) or the DATE itself. */
object GraftDaysFunction extends UnboundFunction {
  override def name(): String = "days"
  override def description(): String =
    "days(ts) = wall-clock day: the hidden day transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"days expects one argument, got ${inputType.catalogString}")
    inputType.fields(0).dataType match {
      case t @ (DateType | TimestampNTZType) => new GraftDaysBound(t)
      case other => throw new UnsupportedOperationException(
        s"days over ${other.catalogString} is session-zone-dependent or unsupported")
    }
  }
}

final class GraftDaysBound(srcType: DataType) extends ScalarFunction[Integer] {
  override def name(): String = "days"
  override def canonicalName(): String = "graft.days"
  override def inputTypes(): Array[DataType] = Array(srcType)
  override def resultType(): DataType = DateType
  override def isResultNullable: Boolean = true

  override def produceResult(input: InternalRow): Integer =
    if (input.isNullAt(0)) null
    else srcType match {
      case DateType => input.getInt(0)
      case _ => Math.floorDiv(input.getLong(0), 86_400_000_000L).toInt
    }
}

/** The `months` transform as a catalog function: months since epoch of
  * the wall-clock value — `(year-1970)*12 + (month-1)`, the key the scan
  * parses back out of a `__part=yyyy-MM` directory. Wall-clock sources
  * only (DATE / TIMESTAMP_NTZ): a session-zone TIMESTAMP month is not a
  * pure function of the value, so it never key-groups. */
object GraftMonthsFunction extends UnboundFunction {
  override def name(): String = "months"
  override def description(): String =
    "months(ts) = months since epoch (wall-clock): the hidden months transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"months expects one argument, got ${inputType.catalogString}")
    inputType.fields(0).dataType match {
      case t @ (DateType | TimestampNTZType) => new GraftEpochUnitBound("months", t)
      case other => throw new UnsupportedOperationException(
        s"months over ${other.catalogString} is session-zone-dependent or unsupported")
    }
  }
}

/** The `years` transform as a catalog function: `year - 1970` of the
  * wall-clock value — the key behind a `__part=yyyy` directory. Same
  * wall-clock gate as [[GraftMonthsFunction]]. */
object GraftYearsFunction extends UnboundFunction {
  override def name(): String = "years"
  override def description(): String =
    "years(ts) = years since epoch (wall-clock): the hidden years transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"years expects one argument, got ${inputType.catalogString}")
    inputType.fields(0).dataType match {
      case t @ (DateType | TimestampNTZType) => new GraftEpochUnitBound("years", t)
      case other => throw new UnsupportedOperationException(
        s"years over ${other.catalogString} is session-zone-dependent or unsupported")
    }
  }
}

/** Shared months/years bound form over a wall-clock day count. */
final class GraftEpochUnitBound(unit: String, srcType: DataType)
    extends ScalarFunction[Integer] {
  override def name(): String = unit
  override def canonicalName(): String = s"graft.$unit"
  override def inputTypes(): Array[DataType] = Array(srcType)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = true
  override def produceResult(input: InternalRow): Integer =
    if (input.isNullAt(0)) null
    else {
      val epochDay: Long = srcType match {
        case DateType => input.getInt(0).toLong
        case _ => Math.floorDiv(input.getLong(0), 86_400_000_000L)
      }
      val d = java.time.LocalDate.ofEpochDay(epochDay)
      if (unit == "months") (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
      else d.getYear - 1970
    }
}

/** The `truncate` transform as a catalog function — string prefix (first
  * `w` characters) or integral floor-to-multiple (`v - floorMod(v, w)`,
  * negatives floor down), bit-identical to the write path's derivation
  * ([[VersionedCatalog.partDeriveExpr]]) so a shuffled plain side lands
  * rows in the right truncation groups. Bound per key type; the result
  * type IS the key type, so truncate-clustered tables key-group joins on
  * the raw column. */
object GraftTruncateFunction extends UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String =
    "truncate(col, w) = string prefix / integral floor-to-multiple: the hidden truncate transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(1).dataType == IntegerType,
      s"truncate expects (key, width INT), got ${inputType.catalogString}")
    inputType.fields(0).dataType match {
      case t @ (StringType | IntegerType | LongType) => new GraftTruncateBound(t)
      case other => throw new UnsupportedOperationException(
        s"truncate over ${other.catalogString} keys is not supported")
    }
  }
}

/** Width-baked `truncate_w<N>(col)` variant — what the SCAN reports for
  * storage-partitioned joins. Spark's KeyGroupedPartitioning compatibility
  * requires every leaf of a partition expression to be a join key, so a
  * `truncate(col, 3)` report (width literal as a child) can never satisfy
  * a join clustered on `col` alone; `bucket` dodges this only because
  * Spark factors `numBuckets` out specially. Baking the width into the
  * function NAME leaves the column as the sole leaf. Both join sides load
  * the same name from this catalog, and the canonical name pins (type,
  * width), so differently-truncated layouts never false-match. */
final case class GraftTruncateWidthFunction(w: Int) extends UnboundFunction {
  override def name(): String = s"truncate_w$w"
  override def description(): String =
    s"truncate_w$w(col) = truncate(col, $w) with the width baked in (SPJ clustering form)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"truncate_w$w expects one argument, got ${inputType.catalogString}")
    inputType.fields(0).dataType match {
      case t @ (StringType | IntegerType | LongType) => new GraftTruncateWidthBound(t, w)
      case other => throw new UnsupportedOperationException(
        s"truncate over ${other.catalogString} keys is not supported")
    }
  }
}

final class GraftTruncateWidthBound(keyType: DataType, w: Int)
    extends ScalarFunction[AnyRef] {
  override def name(): String = s"truncate_w$w"
  override def canonicalName(): String =
    s"graft.truncate(${keyType.catalogString},$w)"
  override def inputTypes(): Array[DataType] = Array(keyType)
  override def resultType(): DataType = keyType
  override def isResultNullable: Boolean = true
  override def produceResult(input: InternalRow): AnyRef =
    if (input.isNullAt(0)) null
    else keyType match {
      case StringType => input.getUTF8String(0).substringSQL(1, w)
      case IntegerType =>
        Integer.valueOf(input.getInt(0) - Math.floorMod(input.getInt(0), w))
      case LongType =>
        java.lang.Long.valueOf(input.getLong(0) - Math.floorMod(input.getLong(0), w.toLong))
      case other => throw new IllegalStateException(s"unbindable $other")
    }
}

final class GraftTruncateBound(keyType: DataType) extends ScalarFunction[AnyRef] {
  override def name(): String = "truncate"
  override def canonicalName(): String = s"graft.truncate(${keyType.catalogString})"
  override def inputTypes(): Array[DataType] = Array(keyType, IntegerType)
  override def resultType(): DataType = keyType
  override def isResultNullable: Boolean = true
  override def produceResult(input: InternalRow): AnyRef =
    if (input.isNullAt(0)) null
    else {
      val w = input.getInt(1)
      keyType match {
        case StringType =>
          // character (codepoint) prefix — substring(c, 1, w)'s semantics
          input.getUTF8String(0).substringSQL(1, w)
        case IntegerType =>
          Integer.valueOf(input.getInt(0) - Math.floorMod(input.getInt(0), w))
        case LongType =>
          java.lang.Long.valueOf(input.getLong(0) - Math.floorMod(input.getLong(0), w.toLong))
        case other => throw new IllegalStateException(s"unbindable $other")
      }
    }
}

/** Bound form: one key type per instance; equal key types on both join
  * sides yield equal canonical names, which (with equal bucket counts) is
  * Spark's co-partitioning test. */
final class GraftBucketBound(keyType: DataType) extends ScalarFunction[Integer] {
  override def name(): String = "bucket"
  override def canonicalName(): String = s"graft.bucket(${keyType.catalogString})"
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    // catalyst hash(NULL) leaves the seed untouched — mirror it
    val h: Int =
      if (input.isNullAt(1)) 42
      else keyType match {
        case LongType | TimestampType | TimestampNTZType =>
          Murmur3_x86_32.hashLong(input.getLong(1), 42)
        case IntegerType | DateType =>
          Murmur3_x86_32.hashInt(input.getInt(1), 42)
        case StringType =>
          val s: UTF8String = input.getUTF8String(1)
          Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
        case other => throw new IllegalStateException(s"unbindable $other")
      }
    ((h % n) + n) % n
  }
}

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

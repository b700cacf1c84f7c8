package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{FileStats, ManifestTable}

/** Metadata-only aggregate pushdown (Iceberg's count-from-manifest): an
  * UNFILTERED global `COUNT(*)` / `COUNT(col)` / `MIN(col)` / `MAX(col)`
  * over a versioned table is answered from the manifest's per-file
  * statistics — row counts, null counts, and exact column bounds — with
  * ZERO data files opened. At 100 TB that turns a full-table scan into a
  * driver-side fold over the file listing.
  *
  * Exactness discipline (stricter than pruning's floor): the pushdown
  * REPLACES the computation, so it engages only when every live entry
  * proves the answer — row counts present for COUNT, bounds present (or
  * the file provably all-null) for MIN/MAX, tags consistent with the
  * declared type. Anything uncertain returns None and the normal scan
  * runs. Spark itself guarantees the other half of the contract: it
  * offers aggregate pushdown only when every filter was consumed by the
  * source, and this source always keeps filters residual — so a filtered
  * query never reaches this path.
  */
private[v2] object AggPushdown {

  /** Plan the aggregation against the live entries; None = not provable
    * from metadata. Returns the scan output schema and its single row. */
  def plan(agg: Aggregation, entries: Seq[ManifestTable.FileEntry],
           dataSchema: StructType, physicalName: String => String)
      : Option[(StructType, InternalRow)] = {
    if (agg.groupByExpressions.nonEmpty) return None
    val decoded = entries.map(e => FileStats.decode(e.stats.getOrElse("")))

    def colName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case f: NamedReference if f.fieldNames.length == 1 =>
          Some(physicalName(f.fieldNames.head).toLowerCase)
        case _ => None
      }
    def declaredType(phys: String): Option[DataType] =
      dataSchema.fields.find(f => physicalName(f.name).equalsIgnoreCase(phys))
        .map(_.dataType)

    def rowCounts: Option[Seq[Long]] = {
      val per = decoded.map(FileStats.rowCount)
      if (per.forall(_.isDefined)) Some(per.flatten) else None
    }

    def comparable(tag: Char, raw: String): Any = tag match {
      case 'l' | 't' | 'n' | 'a' | 'b' => raw.toLong
      case 'd' => raw.toDouble
      case 's' => raw
      case 'm' => new java.math.BigDecimal(raw)
    }
    def lt(tag: Char, a: Any, b: Any): Boolean = tag match {
      case 'l' | 't' | 'n' | 'a' | 'b' => a.asInstanceOf[Long] < b.asInstanceOf[Long]
      case 'd' => a.asInstanceOf[Double] < b.asInstanceOf[Double]
      case 's' => a.asInstanceOf[String].compareTo(b.asInstanceOf[String]) < 0
      case 'm' => a.asInstanceOf[java.math.BigDecimal]
        .compareTo(b.asInstanceOf[java.math.BigDecimal]) < 0
    }
    def toCatalyst(tag: Char, v: Any, dt: DataType): Option[Any] = dt match {
      case ByteType    => Some(v.asInstanceOf[Long].toByte)
      case ShortType   => Some(v.asInstanceOf[Long].toShort)
      case IntegerType => Some(v.asInstanceOf[Long].toInt)
      case LongType    => Some(v.asInstanceOf[Long])
      case FloatType   => Some(v.asInstanceOf[Double].toFloat)
      case DoubleType  => Some(v.asInstanceOf[Double])
      case DateType    => Some(v.asInstanceOf[Long].toInt)
      case TimestampType | TimestampNTZType => Some(v.asInstanceOf[Long])
      case BooleanType => Some(v.asInstanceOf[Long] != 0L)
      case StringType  => Some(UTF8String.fromString(v.asInstanceOf[String]))
      case d: DecimalType =>
        val dec = org.apache.spark.sql.types.Decimal(v.asInstanceOf[java.math.BigDecimal])
        if (dec.changePrecision(d.precision, d.scale)) Some(dec) else None
      case _ => None
    }
    def expectedTag(dt: DataType): Option[Char] = dt match {
      case ByteType | ShortType | IntegerType | LongType => Some('l')
      case FloatType | DoubleType => Some('d')
      case StringType => Some('s')
      case _: DecimalType => Some('m')
      case TimestampType => Some('t')
      case TimestampNTZType => Some('n')
      case DateType => Some('a')
      case BooleanType => Some('b')
      case _ => None
    }

    /** MIN/MAX of a column across entries: every file must carry exact
      * bounds OR be provably all-null for it; an all-null table yields
      * SQL NULL. */
    def bound(phys: String, isMin: Boolean): Option[(DataType, Any)] =
      for {
        dt <- declaredType(phys)
        tag <- expectedTag(dt)
        rows <- rowCounts
        per <- {
          val vals = decoded.zip(rows).map { case (m, nRows) =>
            m.get(phys) match {
              case Some(cs) if cs.tag == tag =>
                (cs.min, cs.max, cs.nulls) match {
                  // NaN bounds (legacy manifests predating the ORC NaN
                  // decline) prove nothing: MIN/MAX over NaN-containing
                  // data is NaN in Spark but these bounds can't say so
                  case (Some(mn), Some(mx), _)
                      if tag == 'd' && (java.lang.Double.isNaN(mn.toDouble) ||
                        java.lang.Double.isNaN(mx.toDouble)) => None
                  case (Some(mn), Some(mx), _) =>
                    Some(Some(comparable(tag, if (isMin) mn else mx)))
                  case (None, None, Some(nulls)) if nulls == nRows =>
                    Some(None) // provably all-null file: contributes nothing
                  case _ => None
                }
              case _ => None
            }
          }
          if (vals.forall(_.isDefined)) Some(vals.flatten.flatten) else None
        }
        value <-
          if (per.isEmpty) Some(null) // no non-null value anywhere: SQL NULL
          else {
            val red = per.reduce((a, b) =>
              if (lt(tag, a, b) == isMin) a else b)
            toCatalyst(tag, red, dt)
          }
      } yield (dt, value)

    /** COUNT(col): non-null rows, needs per-file null counts + rows. */
    def nonNullCount(phys: String): Option[Long] =
      for {
        _ <- declaredType(phys)
        rows <- rowCounts
        per <- {
          val vals = decoded.zip(rows).map { case (m, nRows) =>
            m.get(phys).flatMap(_.nulls).map(nRows - _)
          }
          if (vals.forall(_.isDefined)) Some(vals.flatten) else None
        }
      } yield per.sum

    val planned: Seq[Option[(StructField, Any)]] =
      agg.aggregateExpressions.toIndexedSeq.zipWithIndex.map {
        case (_: CountStar, i) =>
          rowCounts.map(rs =>
            (StructField(s"agg_$i", LongType, nullable = false), rs.sum))
        case (c: Count, i) if !c.isDistinct =>
          colName(c.column).flatMap(nonNullCount).map(n =>
            (StructField(s"agg_$i", LongType, nullable = false), n))
        case (m: Min, i) =>
          colName(m.column).flatMap(bound(_, isMin = true)).map { case (dt, v) =>
            (StructField(s"agg_$i", dt, nullable = true), v) }
        case (m: Max, i) =>
          colName(m.column).flatMap(bound(_, isMin = false)).map { case (dt, v) =>
            (StructField(s"agg_$i", dt, nullable = true), v) }
        case _ => None
      }
    if (planned.exists(_.isEmpty)) None
    else {
      val fields = planned.flatten
      Some((StructType(fields.map(_._1)),
        new GenericInternalRow(fields.map(_._2).toArray)))
    }
  }
}

/** The one-row scan a fully-pushed aggregate builds: the answer was
  * computed from the manifest at plan time; execution just emits it. */
private[v2] class GraftAggScan(schema: StructType, row: InternalRow)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftAggScan[metadata-only aggregate, ${schema.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftAggPartition(row))
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftAggReaderFactory
}

private[v2] case class GraftAggPartition(row: InternalRow) extends InputPartition

private[v2] class GraftAggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val row = p.asInstanceOf[GraftAggPartition].row
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

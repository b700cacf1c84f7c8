package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{FileStats, ManifestTable}

/** Metadata-only aggregate pushdown (Iceberg's count-from-manifest): an
  * UNFILTERED `COUNT(*)` / `COUNT(col)` / `MIN(col)` / `MAX(col)` over a
  * versioned table — global, or GROUP BY the table's identity partition
  * columns — is answered from the manifest's per-file statistics: row
  * counts, null counts, exact column bounds, and (for identity columns)
  * the exact value each partition directory pins. ZERO data files are
  * opened. At 100 TB that turns a full-table scan into a driver-side
  * fold over the file listing, and a per-partition rollup into one row
  * per directory.
  *
  * Exactness discipline (stricter than pruning's floor): the pushdown
  * REPLACES the computation, so it engages only when every live entry
  * proves the answer — row counts present for COUNT, bounds present (or
  * the file provably all-null) for MIN/MAX, tags consistent with the
  * declared type, every entry inside a grouped pushdown carrying a
  * parseable directory value for every grouping column. Anything
  * uncertain returns None and the normal scan runs. Spark itself
  * guarantees the other half of the contract: it offers aggregate
  * pushdown only when every filter was consumed by the source, and this
  * source always keeps filters residual — so a filtered query never
  * reaches this path.
  */
private[v2] object AggPushdown {

  private def expectedTag(dt: DataType): Option[Char] = dt match {
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

  /** An identity-partition directory value as the canonical string of the
    * column's stats tag domain; None = not representable (never push). */
  private def canonicalOf(tag: Char, raw: String): Option[String] =
    scala.util.Try {
      tag match {
        case 'l' => raw.toLong.toString
        case 'd' => val d = raw.toDouble; require(!java.lang.Double.isNaN(d)); d.toString
        case 's' => require(raw.length <= 64 && raw.forall(_ < 0x80)); raw
        case 'a' => java.time.LocalDate.parse(raw).toEpochDay.toString
        case 'b' => if (raw.toBoolean) "1" else "0"
        case 'm' => new java.math.BigDecimal(raw).toPlainString
        case _   => throw new IllegalArgumentException("unsupported dir tag")
      }
    }.toOption

  /** The Catalyst value of an identity-partition directory string. */
  private def dirCatalystValue(raw: String, dt: DataType): Option[Any] =
    scala.util.Try {
      dt match {
        case StringType  => UTF8String.fromString(raw)
        case ByteType    => raw.toByte
        case ShortType   => raw.toShort
        case IntegerType => raw.toInt
        case LongType    => raw.toLong
        case BooleanType => raw.toBoolean
        case DateType    => java.time.LocalDate.parse(raw).toEpochDay.toInt
        case _ => throw new IllegalArgumentException("ungroupable dir type")
      }
    }.toOption

  /** Plan the aggregation against the live entries; None = not provable
    * from metadata. Returns the scan output schema (grouping columns
    * FIRST, then aggregate columns — the order Spark's pushdown rule
    * binds positionally) and its rows. */
  def plan(agg: Aggregation, entries: Seq[ManifestTable.FileEntry],
           dataSchema: StructType, physicalName: String => String,
           identityCols: Seq[String]): Option[(StructType, Seq[InternalRow])] = {

    def declaredTypeOf(logical: String): Option[DataType] =
      dataSchema.fields.find(_.name.equalsIgnoreCase(logical)).map(_.dataType)
    def declaredType(phys: String): Option[DataType] =
      dataSchema.fields.find(f => physicalName(f.name).equalsIgnoreCase(phys))
        .map(_.dataType)

    // identity partition columns: physical lowercase name -> declared type
    val identity: Seq[(String, DataType)] = identityCols.flatMap(c =>
      declaredTypeOf(c).map(dt => physicalName(c).toLowerCase -> dt))

    def dirsOf(rel: String): Map[String, String] =
      rel.split('/').dropRight(1).flatMap { seg =>
        val i = seg.indexOf('=')
        if (i < 0) None else Some(seg.take(i).toLowerCase -> seg.drop(i + 1))
      }.toMap
    val entryDirs: Seq[Map[String, String]] = entries.map(e => dirsOf(e.rel))

    // effective per-entry stats: footer-derived stats plus identity-dir
    // columns synthesized as EXACT min=max (every row of the file carries
    // the directory's value) — or provably-all-null for the hive default
    // partition when the row count is known
    val decoded: Seq[Map[String, FileStats.ColStats]] =
      entries.indices.map { i =>
        val base = FileStats.decode(entries(i).stats.getOrElse(""))
        val synth = identity.flatMap { case (phys, dt) =>
          for {
            tag <- expectedTag(dt)
            escaped <- entryDirs(i).get(phys)
            cs <-
              if (escaped == ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
                FileStats.rowCount(base).map(n =>
                  FileStats.ColStats(tag, None, None, Some(n)))
              else canonicalOf(tag, ExternalCatalogUtils.unescapePathName(escaped))
                .map(v => FileStats.ColStats(tag, Some(v), Some(v), Some(0L)))
          } yield phys -> cs
        }
        base ++ synth
      }

    def colName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case f: NamedReference if f.fieldNames.length == 1 =>
          Some(physicalName(f.fieldNames.head).toLowerCase)
        case _ => None
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

    /** The aggregate columns computed over one SUBSET of entries (the
      * whole table, or one identity-directory group). */
    def planAggsOver(idx: Seq[Int]): Option[Seq[(StructField, Any)]] = {
      def rowCounts: Option[Seq[Long]] = {
        val per = idx.map(i => FileStats.rowCount(decoded(i)))
        if (per.forall(_.isDefined)) Some(per.flatten) else None
      }

      /** MIN/MAX of a column: every file must carry exact bounds OR be
        * provably all-null for it; an all-null subset yields SQL NULL. */
      def bound(phys: String, isMin: Boolean): Option[(DataType, Any)] =
        for {
          dt <- declaredType(phys)
          tag <- expectedTag(dt)
          rows <- rowCounts
          per <- {
            val vals = idx.zip(rows).map { case (i, nRows) =>
              decoded(i).get(phys) match {
                case Some(cs) if cs.tag == tag =>
                  (cs.min, cs.max, cs.nulls) match {
                    // NaN bounds (legacy manifests predating the ORC NaN
                    // decline) prove nothing
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
            val vals = idx.zip(rows).map { case (i, nRows) =>
              decoded(i).get(phys).flatMap(_.nulls).map(nRows - _)
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
      if (planned.exists(_.isEmpty)) None else Some(planned.flatten)
    }

    if (agg.groupByExpressions.isEmpty) {
      planAggsOver(entries.indices).map { fields =>
        (StructType(fields.map(_._1)),
          Seq(new GenericInternalRow(fields.map(_._2).toArray)))
      }
    } else {
      // GROUP BY must be exactly over identity partition columns: each
      // directory pins its group, so groups fold per-directory stats
      val groupCols: Seq[Option[(String, String, DataType)]] =
        agg.groupByExpressions.toIndexedSeq.map {
          case f: NamedReference if f.fieldNames.length == 1 =>
            val logical = f.fieldNames.head
            val phys = physicalName(logical).toLowerCase
            val groupable: DataType => Boolean = {
              case StringType | ByteType | ShortType | IntegerType | LongType |
                   BooleanType | DateType => true
              case _ => false
            }
            for {
              dt <- declaredTypeOf(logical)
              _ <- identity.find(_._1 == phys)
              _ <- Some(()).filter(_ => groupable(dt))
            } yield (logical, phys, dt)
          case _ => None
        }
      if (groupCols.exists(_.isEmpty)) return None
      val gc = groupCols.flatten

      // every entry must sit in a directory for every grouping column
      val keys: Seq[Option[Seq[String]]] = entries.indices.map { i =>
        val raws = gc.map { case (_, phys, _) => entryDirs(i).get(phys) }
        if (raws.forall(_.isDefined)) Some(raws.flatten) else None
      }
      if (keys.exists(_.isEmpty)) return None

      val groups: Seq[(Seq[String], Seq[Int])] = entries.indices
        .groupBy(i => keys(i).get).toSeq.sortBy(_._1.mkString("\u0000"))

      val rows = groups.map { case (raw, idx) =>
        val groupValues: Seq[Option[Any]] = gc.zip(raw).map { case ((_, _, dt), r) =>
          if (r == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) Some(null)
          else dirCatalystValue(ExternalCatalogUtils.unescapePathName(r), dt)
        }
        for {
          gv <- if (groupValues.forall(_.isDefined)) Some(groupValues.flatten) else None
          aggs <- planAggsOver(idx)
        } yield (gv, aggs)
      }
      if (rows.exists(_.isEmpty)) return None
      val resolved = rows.flatten
      val aggFields = resolved.headOption.map(_._2.map(_._1)).getOrElse {
        // zero groups (empty table): still need the agg schema
        planAggsOver(Nil).map(_.map(_._1)).getOrElse(return None)
      }
      val groupFields = gc.map { case (logical, _, dt) =>
        StructField(logical, dt, nullable = true)
      }
      Some((StructType(groupFields ++ aggFields),
        resolved.map { case (gv, aggs) =>
          new GenericInternalRow((gv ++ aggs.map(_._2)).toArray)
        }))
    }
  }
}

/** The rows-scan a fully-pushed aggregate builds: the answer was computed
  * from the manifest at plan time (one row globally; one per identity
  * directory when grouped); execution just emits it. */
private[v2] class GraftAggScan(schema: StructType, rows: Seq[InternalRow])
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftAggScan[metadata-only aggregate, ${rows.size} rows, " +
      s"${schema.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftAggPartition(rows.toArray))
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftAggReaderFactory
}

private[v2] case class GraftAggPartition(rows: Array[InternalRow]) extends InputPartition

private[v2] class GraftAggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rows = p.asInstanceOf[GraftAggPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = rows(i)
      override def close(): Unit = ()
    }
  }
}

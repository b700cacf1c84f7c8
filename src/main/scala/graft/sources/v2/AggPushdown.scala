package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Cast => V2Cast, Expression => V2Expr, Extract => V2Extract, GeneralScalarExpression, Literal => V2Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{FileStats, ManifestTable}

/** Metadata-only aggregate pushdown (Iceberg's count-from-manifest): an
  * UNFILTERED `COUNT(*)` / `COUNT(col)` / `MIN(col)` / `MAX(col)` over a
  * versioned table — global, or GROUPED — is answered from the
  * manifest's per-file statistics: row counts, null counts, exact column
  * bounds, and (for identity columns) the exact value each partition
  * directory pins. Grouping keys cover identity partition columns, bare
  * columns whose per-file bounds collapse, and the monotone transforms a
  * hidden layout pins by construction: `CAST(col AS date)` /
  * `to_date`, `year`/`quarter`/`month`/`day` extracts, and anchored
  * string prefixes (`substring(col, 1, m)` — the truncate transform's
  * read shape). ZERO data files are opened. At 100 TB that turns a
  * full-table scan into a driver-side fold over the file listing, and a
  * per-partition rollup into one row per directory.
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
      // GROUP BY expressions the manifest can answer: every live entry
      // must PIN one group value per grouping expression — through its
      // identity directory (the dir value IS the group), or through its
      // footer stats when the per-file bounds provably collapse the
      // expression to ONE value for every row. Monotone transforms pin
      // from the two bounds alone: cast-to-date (in the READER's session
      // zone — dir names were written in the writer's zone and cannot be
      // trusted across zones, the bounds can), EXTRACT over that date,
      // and string prefixes (byte-order squeeze: bounds sharing a prefix
      // force every row between them to share it). Hidden days/months/
      // years/truncate layouts pin by construction — each directory's
      // files span one transform value — but so does any naturally
      // clustered table. Uncertain anywhere → None → real scan.
      def rowsOf(i: Int): Option[Long] = FileStats.rowCount(decoded(i))
      // a group must own at least one row: zero-row files (a Complete-
      // mode streaming epoch that drained empty) pin no group
      if (entries.indices.exists(i => rowsOf(i).isEmpty)) return None
      val contributing = entries.indices.filter(i => rowsOf(i).get > 0L)

      val sessionZone = java.time.ZoneId.of(
        org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)

      def refName(x: V2Expr): Option[String] = x match {
        case f: NamedReference if f.fieldNames.length == 1 => Some(f.fieldNames.head)
        case _ => None
      }
      def litInt(x: V2Expr): Option[Int] = x match {
        case l: V2Literal[_] if l.dataType == IntegerType =>
          Some(l.value.asInstanceOf[Int])
        case _ => None
      }
      // a date-shaped source: CAST(col AS date) over a timestamp/date
      // column, or a bare date column — the shapes Spark's translation
      // emits for to_date(ts)/year(ts)/month(ts)/day(ts)
      def dateSource(x: V2Expr): Option[String] = x match {
        case c: V2Cast if c.dataType == DateType =>
          refName(c.expression).filter(l => declaredTypeOf(l).exists {
            case TimestampType | TimestampNTZType | DateType => true
            case _ => false
          })
        case r: NamedReference =>
          refName(r).filter(l => declaredTypeOf(l).contains(DateType))
        case _ => None
      }
      // an entry's column under cast-to-date, as the (date-of-min,
      // date-of-max) envelope — cast-to-date is monotone, so every row's
      // date lies inside it. Some(Some((a,b))) = envelope, Some(None) =
      // every row NULL, None = not provable
      def dateRangePin(logical: String)(i: Int)
          : Option[Option[(java.time.LocalDate, java.time.LocalDate)]] = {
        val phys = physicalName(logical).toLowerCase
        def instantOf(raw: String): java.time.Instant =
          java.time.Instant.ofEpochSecond(
            Math.floorDiv(raw.toLong, 1000000L),
            Math.floorMod(raw.toLong, 1000000L) * 1000L)
        def toDate(tag: Char, raw: String): Option[java.time.LocalDate] =
          scala.util.Try(tag match {
            case 't' => instantOf(raw).atZone(sessionZone).toLocalDate
            case 'n' => java.time.LocalDate.ofEpochDay(
              Math.floorDiv(raw.toLong, 86400000000L))
            case 'a' => java.time.LocalDate.ofEpochDay(raw.toLong)
            case _   => throw new IllegalArgumentException("not a temporal tag")
          }).toOption
        // instant→LocalDate in the session zone is monotone UNLESS a
        // backward (overlap) offset transition crossing local midnight
        // sits inside the bounds (historical 00:01 fallbacks — e.g.
        // America/St_Johns pre-2011): then a mid-file row's date can fall
        // OUTSIDE the bounds' date envelope, so the pin must decline.
        // Gaps and non-midnight overlaps keep dates non-decreasing;
        // fixed-offset zones have no transitions at all.
        def dateMonotone(lo: java.time.Instant, hi: java.time.Instant): Boolean = {
          val rules = sessionZone.getRules
          if (rules.isFixedOffset) return true
          var t = rules.nextTransition(lo)
          var n = 0
          while (t != null && !t.getInstant.isAfter(hi)) {
            if (t.isOverlap &&
                t.getDateTimeBefore.toLocalDate != t.getDateTimeAfter.toLocalDate)
              return false
            n += 1
            if (n >= 1024) return false // unbounded walk: decline, stay exact
            t = rules.nextTransition(t.getInstant)
          }
          true
        }
        for {
          dt <- declaredTypeOf(logical)
          tag <- expectedTag(dt)
          cs <- decoded(i).get(phys)
          if cs.tag == tag
          n <- rowsOf(i)
          pin <- (cs.min, cs.max, cs.nulls) match {
            case (None, None, Some(nulls)) if nulls == n => Some(None)
            case (Some(mn), Some(mx), Some(0L)) =>
              for {
                a <- toDate(tag, mn); b <- toDate(tag, mx)
                if tag != 't' ||
                  scala.util.Try(dateMonotone(instantOf(mn), instantOf(mx)))
                    .getOrElse(false)
              } yield Some((a, b))
            case _ => None
          }
        } yield pin
      }
      // the single date the envelope collapses to (CAST(col AS date))
      def datePin(logical: String)(i: Int): Option[Option[java.time.LocalDate]] =
        dateRangePin(logical)(i).flatMap {
          case None => Some(None)
          case Some((a, b)) => if (a == b) Some(Some(a)) else None
        }
      // equality pin of a bare column: bounds collapsed to one value (or
      // provably all-null). Floating point declined — NaN poisoning and
      // -0.0 grouping semantics make bounds equality unreliable there.
      def eqPin(logical: String, dt: DataType)(i: Int): Option[Any] = {
        val phys = physicalName(logical).toLowerCase
        for {
          tag <- expectedTag(dt)
          if tag != 'd'
          cs <- decoded(i).get(phys)
          if cs.tag == tag
          n <- rowsOf(i)
          pin <- (cs.min, cs.max, cs.nulls) match {
            case (None, None, Some(nulls)) if nulls == n => Some(null)
            case (Some(mn), Some(mx), Some(0L)) if mn == mx =>
              toCatalyst(tag, comparable(tag, mn), dt)
            case _ => None
          }
        } yield pin
      }
      // string-prefix pin: bounds sharing the same length-m character
      // prefix squeeze every row between them (byte order; bounds are
      // exact ASCII when present) onto that prefix
      def prefixPin(logical: String, m: Int)(i: Int): Option[Any] = {
        val phys = physicalName(logical).toLowerCase
        for {
          cs <- decoded(i).get(phys)
          if cs.tag == 's'
          n <- rowsOf(i)
          pin <- (cs.min, cs.max, cs.nulls) match {
            case (None, None, Some(nulls)) if nulls == n => Some(null)
            case (Some(mn), Some(mx), Some(0L)) if mn.take(m) == mx.take(m) =>
              Some(UTF8String.fromString(mn.take(m)))
            case _ => None
          }
        } yield pin
      }
      // identity-directory pin: the dir value pins the group even when
      // the file carries no stats
      def dirPin(logical: String, dt: DataType)(i: Int): Option[Any] = {
        val groupable = dt match {
          case StringType | ByteType | ShortType | IntegerType | LongType |
               BooleanType | DateType => true
          case _ => false
        }
        val phys = physicalName(logical).toLowerCase
        if (!groupable || !identity.exists(_._1 == phys)) None
        else entryDirs(i).get(phys).flatMap { r =>
          if (r == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) Some(null)
          else dirCatalystValue(ExternalCatalogUtils.unescapePathName(r), dt)
        }
      }

      // one (output field, per-entry pin) per grouping expression
      val pins: Seq[Option[(StructField, Int => Option[Any])]] =
        agg.groupByExpressions.toIndexedSeq.zipWithIndex.map {
          case (f: NamedReference, _) =>
            for {
              logical <- refName(f)
              dt <- declaredTypeOf(logical)
            } yield (StructField(logical, dt, nullable = true),
              (i: Int) => dirPin(logical, dt)(i).orElse(eqPin(logical, dt)(i)))
          case (c: V2Cast, gi) if c.dataType == DateType =>
            dateSource(c).map(logical =>
              (StructField(s"group_$gi", DateType, nullable = true),
                (i: Int) => datePin(logical)(i).map(_.map(d =>
                  d.toEpochDay.toInt: Any).orNull)))
          case (ex: V2Extract, gi) =>
            // EXTRACT pins only at monotone granularity: the extracted
            // field cycles (January recurs every year), so the bounds must
            // agree on everything COARSER too — YEAR pins on same year,
            // QUARTER/MONTH on same year+field, DAY on the exact date
            type D = java.time.LocalDate
            def quarter(d: D): Int = (d.getMonthValue - 1) / 3 + 1
            val part: Option[(D, D) => Option[Int]] = ex.field() match {
              case "YEAR" => Some((a, b) =>
                if (a.getYear == b.getYear) Some(a.getYear) else None)
              case "QUARTER" => Some((a, b) =>
                if (a.getYear == b.getYear && quarter(a) == quarter(b))
                  Some(quarter(a)) else None)
              case "MONTH" => Some((a, b) =>
                if (java.time.YearMonth.from(a) == java.time.YearMonth.from(b))
                  Some(a.getMonthValue) else None)
              case "DAY" => Some((a, b) =>
                if (a == b) Some(a.getDayOfMonth) else None)
              case _ => None
            }
            for {
              p <- part
              logical <- dateSource(ex.source())
            } yield (StructField(s"group_$gi", IntegerType, nullable = true),
              (i: Int) => dateRangePin(logical)(i).flatMap {
                case None => Some(null)
                case Some((a, b)) => p(a, b).map(v => v: Any)
              })
          case (g: GeneralScalarExpression, gi)
              if g.name == "SUBSTRING" && g.children().length == 3 &&
                litInt(g.children()(1)).contains(1) =>
            for {
              logical <- refName(g.children()(0))
              if declaredTypeOf(logical).contains(StringType)
              m <- litInt(g.children()(2))
              if m >= 1
            } yield (StructField(s"group_$gi", StringType, nullable = true),
              (i: Int) => prefixPin(logical, m)(i))
          case _ => None
        }
      if (pins.exists(_.isEmpty)) return None
      val ps = pins.flatten

      val keys: Seq[Option[Seq[Any]]] = contributing.map { i =>
        val vs = ps.map(_._2(i))
        if (vs.forall(_.isDefined)) Some(vs.map(_.get)) else None
      }
      if (keys.exists(_.isEmpty)) return None

      val groups: Seq[(Seq[Any], Seq[Int])] = contributing.zip(keys)
        .groupBy(_._2.get).view.mapValues(_.map(_._1).toSeq).toSeq
        .sortBy(_._1.map(String.valueOf).mkString("\u0000"))

      val rows = groups.map { case (gv, idx) =>
        planAggsOver(idx).map(aggs => (gv, aggs))
      }
      if (rows.exists(_.isEmpty)) return None
      val resolved = rows.flatten
      val aggFields = resolved.headOption.map(_._2.map(_._1)).getOrElse {
        // zero groups (empty table): still need the agg schema
        planAggsOver(Nil).map(_.map(_._1)).getOrElse(return None)
      }
      Some((StructType(ps.map(_._1) ++ aggFields),
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

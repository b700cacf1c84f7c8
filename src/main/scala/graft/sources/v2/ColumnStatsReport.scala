package graft.sources.v2

import java.util.{Optional, OptionalLong}

import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.Statistics
import org.apache.spark.sql.connector.read.colstats
import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
import org.apache.spark.sql.types._

import graft.sources.{FileStats, ManifestTable, NdvStats}

/** Table-level column statistics for Spark's cost-based planning,
  * assembled from metadata the table format already keeps — the
  * integration point Iceberg's `SparkScan.estimateStatistics` feeds
  * (min/max/null from manifest entries, NDV from Puffin sketches) and
  * Trino consumes for join ordering. Spark's
  * `DataSourceV2Relation.transformV2Stats` lifts the
  * [[ColumnStatistics]] map into catalyst `ColumnStat`s, so with
  * `spark.sql.cbo.enabled` FilterEstimation shrinks a filtered
  * dimension's row estimate from these bounds and JoinSelection picks
  * the broadcast side from DATA instead of defaults — at 100 TB the
  * difference between a broadcast and a full shuffle of the fact table.
  *
  * Sources, all metadata-only at plan time:
  *  - row count: sum of per-file `__rows` over the PRUNED listing (the
  *    same floor-disciplined set the scan will read);
  *  - min/max: fold of per-file footer bounds ([[FileStats]]), reported
  *    only when EVERY surviving file carries the bound (a stats-less
  *    file could hold anything) and converted to the LOGICAL column
  *    type's catalyst value (renames and type widening resolve here);
  *  - null count: sum, same every-file rule;
  *  - NDV: the snapshot's commit-time HLL sketch ([[NdvStats]]) — a
  *    table-level figure, reported as-is on a filtered scan (an upper
  *    bound, the safe direction for build-side choice).
  *
  * Under live MOR deletes the row count subtracts the EXACT positional
  * tombstone total carried in the DV slice indexes ([[graft.sources
  * .DeleteVectors.Slice.count]]) for targets surviving the pruned
  * listing — capped per target at the file's own `__rows` so a
  * duplicated external tombstone can never push the estimate below
  * truth — while equality deletes and pre-count DV entries keep the
  * undeleted upper bound. NDV stays an upper bound either way (HLL
  * can't subtract) — estimates, never results. */
private[v2] object ColumnStatsReport {

  private case class ColStat(ndv: Option[Long], minV: Option[Any],
                             maxV: Option[Any], nulls: Option[Long],
                             histo: Option[colstats.Histogram] = None)
      extends ColumnStatistics {
    override def distinctCount(): OptionalLong =
      ndv.map(OptionalLong.of).getOrElse(OptionalLong.empty())
    override def min(): Optional[Object] =
      Optional.ofNullable(minV.map(_.asInstanceOf[Object]).orNull)
    override def max(): Optional[Object] =
      Optional.ofNullable(maxV.map(_.asInstanceOf[Object]).orNull)
    override def nullCount(): OptionalLong =
      nulls.map(OptionalLong.of).getOrElse(OptionalLong.empty())
    override def histogram(): Optional[colstats.Histogram] =
      Optional.ofNullable(histo.orNull)
  }

  private case class Bin(l: Double, h: Double, d: Long)
      extends colstats.HistogramBin {
    override def lo(): Double = l
    override def hi(): Double = h
    override def ndv(): Long = d
  }

  private case class Histo(ht: Double, bs: Array[colstats.HistogramBin])
      extends colstats.Histogram {
    override def height(): Double = ht
    override def bins(): Array[colstats.HistogramBin] = bs
  }

  /** Equi-height histogram from a column's commit-time KLL sketch —
    * the tier that fixes SKEWED-predicate selectivity (NDV+bounds-only
    * estimation interpolates a range uniformly between min and max; a
    * heavy-tailed column makes that estimate wrong by orders of
    * magnitude, flipping join decisions the wrong way at 100 TB). Bin
    * boundaries are the sketch's equi-spaced quantiles in catalyst's
    * comparison domain (`EstimationUtils.toDouble`: numerics by value,
    * dates in days, timestamps in micros — [[graft.functions
    * .KllDoublesAgg]] feeds the same domain); `height` (rows per bin)
    * comes from the sketch's own value count, and per-bin distinct
    * counts spread the table NDV uniformly (KLL tracks ranks, not
    * distincts — the boundary placement carries the skew signal). */
  private def histogramOf(kll: Array[Byte], ndv: Option[Long],
                          numBins: Int, lo: Option[Double],
                          hi: Option[Double]): Option[colstats.Histogram] =
    scala.util.Try {
      val sk = org.apache.datasketches.kll.KllDoublesSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(kll))
      if (sk.isEmpty) None
      else {
        val qs = sk.getQuantiles((0 to numBins).map(_.toDouble / numBins).toArray)
        // the OUTER bin edges must cover the column's EXACT bounds
        // (FilterEstimation asserts the [min,max] range fits inside the
        // histogram): the sketch's own extremes can fall short of them —
        // the write-path KLL tier samples rows, and a stale parent-walk
        // sidecar can predate files that extended the range — so widen
        // the first/last edge to the manifest-exact bounds. Interior
        // boundaries keep the sketch's skew signal untouched.
        qs(0) = math.min(qs(0), lo.getOrElse(qs(0)))
        qs(numBins) = math.max(qs(numBins), hi.getOrElse(qs(numBins)))
        val perBinNdv = math.max(1L, ndv.getOrElse(numBins.toLong) / numBins)
        val bins: Array[colstats.HistogramBin] =
          (0 until numBins).map(i => Bin(qs(i), qs(i + 1), perBinNdv): colstats.HistogramBin).toArray
        Some(Histo(sk.getN.toDouble / numBins, bins))
      }
    }.toOption.flatten

  /** A manifest bound string in the histogram's DOUBLE comparison
    * domain (`EstimationUtils.toDouble`): integral/date/timestamp tags
    * hold the internal long, decimals parse exactly. Strings have no
    * histogram tier; None keeps the sketch's own edge. */
  private def boundDouble(tag: Char, s: String): Option[Double] =
    scala.util.Try {
      tag match {
        case 'l' | 't' | 'n' | 'a' | 'b' => s.toLong.toDouble
        case 'd' => s.toDouble
        case 'm' => BigDecimal(s).toDouble
        case _ => throw new IllegalArgumentException(s"no histogram domain for $tag")
      }
    }.toOption.filterNot(_.isNaN)

  private case class TableStats(size: OptionalLong, rows: OptionalLong,
      cols: java.util.Map[NamedReference, ColumnStatistics]) extends Statistics {
    override def sizeInBytes(): OptionalLong = size
    override def numRows(): OptionalLong = rows
    override def columnStats(): java.util.Map[NamedReference, ColumnStatistics] = cols
  }

  /** The canonical bound string as the LOGICAL type's catalyst value
    * (what `ColumnStat.min/max` holds after ANALYZE). Strings are
    * skipped — CBO range estimation is numeric and UTF-8 footer order
    * diverges from UTF-16 anyway. */
  private def catalystValue(dt: DataType, tag: Char, s: String): Option[Any] =
    scala.util.Try {
      (dt, tag) match {
        case (ByteType, 'l')         => s.toLong.toByte
        case (ShortType, 'l')        => s.toLong.toShort
        case (IntegerType, 'l')      => s.toLong.toInt
        case (LongType, 'l')         => s.toLong
        case (FloatType, 'd')        => s.toDouble.toFloat
        case (DoubleType, 'd')       => s.toDouble
        case (_: DecimalType, 'm')   => Decimal(BigDecimal(s))
        case (DateType, 'a')         => s.toLong.toInt
        case (TimestampType, 't')    => s.toLong
        case (TimestampNTZType, 'n') => s.toLong
        case (BooleanType, 'b')      => s == "1"
        case _ => throw new IllegalArgumentException("unreportable")
      }
    }.toOption

  /** Sum of per-file `__rows` under the every-file rule: None when any
    * file lacks the count (a stats-less file could hold any number of
    * rows), Some(0) for an empty listing. Shared by the CBO report and
    * `tbl.stats`. */
  private[v2] def rowCountOf(
      decoded: Seq[Map[String, FileStats.ColStats]]): Option[Long] =
    if (decoded.isEmpty) Some(0L)
    else {
      val perFile = decoded.map(FileStats.rowCount)
      if (perFile.forall(_.isDefined)) Some(perFile.flatten.sum) else None
    }

  /** Canonical-string fold of one column's bounds across files: reported
    * only when EVERY file carries the bound under the expected tag (a
    * stats-less file could hold anything). Shared by the CBO report and
    * the `tbl.stats` display surface. */
  private[v2] def foldBounds(decoded: Seq[Map[String, FileStats.ColStats]],
                             phys: String, tag: Char)
      : (Option[String], Option[String], Option[Long]) = {
    val perFile = decoded.map(_.get(phys))
    val complete = decoded.nonEmpty && perFile.forall(_.exists(_.tag == tag))
    def fold(pick: FileStats.ColStats => Option[String], isMin: Boolean) =
      if (!complete) None
      else {
        val bs = perFile.flatten.map(pick)
        if (bs.forall(_.isDefined))
          Some(FileStats.reduceBound(bs.flatten, tag, isMin))
        else None
      }
    val nulls =
      if (complete && perFile.flatten.forall(_.nulls.isDefined))
        Some(perFile.flatten.flatMap(_.nulls).sum)
      else None
    (fold(_.min, isMin = true), fold(_.max, isMin = false), nulls)
  }

  /** Positional-tombstone total over the pruned listing: DV slice
    * counts summed per surviving target, capped at the target's own
    * `__rows`. EXACT for engine-written deletes (direct DML computes
    * positions over merge-on-read bases, so slices of one target never
    * overlap across commits); an EXTERNAL CDC writer that replays
    * overlapping tombstones can make the sum over-subtract toward the
    * per-target floor of zero — the same estimate discipline Iceberg's
    * snapshot-summary delete counts accept, remediable by
    * `rewrite_deletes`/`compute_stats`. Targets pruned from the listing
    * don't count — their rows aren't in the row-count sum either.
    * Metadata-only: no blob is read. */
  private[v2] def tombstonesOf(root: String,
      entries: Seq[ManifestTable.FileEntry],
      decoded: Seq[Map[String, FileStats.ColStats]],
      deleteEntries: Seq[ManifestTable.FileEntry]): Long = {
    if (deleteEntries.isEmpty) return 0L
    val rowsByEnc: Map[String, Long] = entries.zip(decoded).flatMap {
      case (e, d) => FileStats.rowCount(d)
        .map(r => ManifestTable.encodedRel(root, e.rel) -> r)
    }.toMap
    deleteEntries.iterator
      .filter(e => ManifestTable.isDvEntry(e.rel))
      .flatMap(_.stats.flatMap(graft.sources.DeleteVectors.decodeIndex)
        .getOrElse(Nil))
      .filter(s => s.count >= 0L && rowsByEnc.contains(s.relEnc))
      .toSeq.groupBy(_.relEnc)
      .map { case (enc, sl) => math.min(sl.map(_.count).sum, rowsByEnc(enc)) }
      .sum
  }

  /** Assemble the report over the pruned listing; falls back to the
    * delegate's size estimate for anything the metadata can't answer. */
  def build(base: Statistics, root: String, version: Option[Long],
            schema: StructType, physicalName: String => String,
            entries: Seq[ManifestTable.FileEntry],
            deleteEntries: Seq[ManifestTable.FileEntry] = Nil): Statistics = {
    val decoded = entries.map(e => FileStats.decode(e.stats.getOrElse("")))
    val tombstones = tombstonesOf(root, entries, decoded, deleteEntries)
    val totalRows = rowCountOf(decoded)
    val liveRows = totalRows.map(r => math.max(0L, r - tombstones))
    val rows: OptionalLong = liveRows
      .map(OptionalLong.of).getOrElse(OptionalLong.empty())
    // per-column null counts come from the UNDELETED footer stats: once
    // tombstones subtract from rowCount they must scale too, or a column
    // could report nullCount > rowCount and FilterEstimation's
    // null-fraction math goes NEGATIVE (uniform-deletion estimate,
    // capped at the live count)
    def scaleNulls(n: Long): Long = (totalRows, liveRows) match {
      case (Some(t), Some(l)) if tombstones > 0 && t > 0 =>
        math.min(l, math.round(n.toDouble * l / t))
      case _ => n
    }
    // ONE parent-stamp walk serves both tiers (estimates/kllSketches
    // would each re-walk the manifests and re-read the sidecar)
    val sketches: Map[String, Array[Byte]] = version
      .flatMap(v => NdvStats.forVersion(root, v)).getOrElse(Map.empty)
    val ndv: Map[String, Long] = sketches.collect {
      case (k, v) if !k.endsWith(NdvStats.KllSuffix) =>
        k.toLowerCase -> NdvStats.estimate(v) }
    val kll: Map[String, Array[Byte]] =
      if (!NdvStats.histogramEnabled) Map.empty
      else sketches.collect {
        case (k, v) if k.endsWith(NdvStats.KllSuffix) =>
          k.stripSuffix(NdvStats.KllSuffix).toLowerCase -> v }
    val numBins = scala.util.Try(
      org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.stats.histogram.bins", "64").toInt)
      .getOrElse(64)
    val cols = new java.util.HashMap[NamedReference, ColumnStatistics]()
    schema.fields.foreach { f =>
      FileStats.tagOf(f.dataType).foreach { tag =>
        val phys = physicalName(f.name).toLowerCase
        val (mn, mx, nulls0) = foldBounds(decoded, phys, tag)
        val nulls = (if (entries.isEmpty) Some(0L) else nulls0).map(scaleNulls)
        val colNdv = ndv.get(phys).filter(_ > 0L)
        val stat = ColStat(colNdv,
          mn.flatMap(catalystValue(f.dataType, tag, _)),
          mx.flatMap(catalystValue(f.dataType, tag, _)), nulls,
          kll.get(phys).flatMap(histogramOf(_, colNdv, numBins,
            mn.flatMap(boundDouble(tag, _)), mx.flatMap(boundDouble(tag, _)))))
        if (stat.ndv.isDefined || stat.minV.isDefined || stat.nulls.isDefined)
          cols.put(Expressions.column(f.name), stat)
      }
    }
    TableStats(base.sizeInBytes(), rows, cols)
  }
}

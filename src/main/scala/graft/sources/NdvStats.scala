package graft.sources

import java.nio.charset.StandardCharsets
import java.util.Base64

import scala.util.Try

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions.{col, hll_sketch_agg}
import org.apache.spark.sql.types._

/** Commit-time per-column NDV sketches — the statistics CBO needs to
  * pick join build sides and broadcast candidates, which per-file
  * min/max/null footer stats alone can't provide (NDV doesn't ride in
  * parquet footers). This is the integration Iceberg gets from Puffin
  * theta sketches written by ANALYZE and reported through `SparkScan`'s
  * `estimateStatistics`; here the sketch is maintained ON EVERY DATA
  * COMMIT instead of by an explicit ANALYZE pass, at near-zero cost:
  *
  *  - the write job carries an [[org.apache.spark.sql.Observation]]
  *    computing `hll_sketch_agg` per column WHILE the rows stream to
  *    the files — no second pass, no read-back, O(columns) sketch
  *    updates per row (the same discipline as the avro writer's
  *    [[FileStats.StatsAccumulator]]);
  *  - the commit loop merges the fresh sketch with the parent
  *    snapshot's (HLL union — mergeable by construction) and publishes
  *    `_stats/<version>` beside the manifest, KBs per column;
  *  - readers resolve the nearest ancestor stats file by parent-stamp
  *    walk, so delete/metadata-only commits (which write no data and
  *    carry no sketch) inherit automatically.
  *
  * The estimate is an UPPER BOUND under deletes (HLL can't subtract;
  * a full rewrite — OPTIMIZE, overwrite — resets the sketch from its
  * own output), which is the safe direction for planning: an
  * overestimated NDV never makes CBO pick a too-small build side.
  * `spark.graft.stats.ndv=false` opts a session's writes out. */
object NdvStats {

  val Dir = "_stats"

  private def conf = org.apache.spark.sql.internal.SQLConf.get

  def enabled: Boolean =
    Try(conf.getConfString("spark.graft.stats.ndv", "true").toBoolean).getOrElse(true)

  /** Sketch-column cap: very wide tables sketch only the first N
    * atomic columns (observation cost is per row × per column). */
  private def maxColumns: Int =
    Try(conf.getConfString("spark.graft.stats.ndv.maxColumns", "48").toInt).getOrElse(48)

  /** Columns worth sketching: top-level atomic types — the only ones
    * CBO estimation consumes. Values are cast to string before the
    * sketch (distinct-preserving; `hll_sketch_agg` accepts only
    * int/long/string/binary natively). */
  private def sketchable(schema: StructType): Seq[String] = {
    def ok(dt: DataType): Boolean = dt match {
      case _: NumericType | StringType | BooleanType | DateType |
           TimestampType | TimestampNTZType => true
      case _ => false
    }
    schema.fields.toSeq.filter(f => ok(f.dataType)).map(_.name).take(maxColumns)
  }

  /** Attach the NDV observation to a write DataFrame. Returns the df to
    * write and the observation to harvest after the action (None when
    * disabled or nothing is sketchable). `allowed` restricts sketching
    * to the named columns (hidden partition derivations opt out). */
  def attach(df: DataFrame, allowed: Set[String] = Set.empty)
      : (DataFrame, Option[Observation]) = {
    if (!enabled) return (df, None)
    val cols = sketchable(df.schema)
      .filter(c => allowed.isEmpty || allowed.contains(c))
    if (cols.isEmpty) return (df, None)
    val obs = Observation(
      s"graft_ndv_${java.util.UUID.randomUUID().toString.take(12)}")
    val aggs = cols.map(c => sketchAgg(df, c))
    (df.observe(obs, aggs.head, aggs.tail: _*), Some(obs))
  }

  /** The sketch aggregate for one column. `hll_sketch_agg` takes
    * int/long/string natively; everything else feeds as a codegen'd
    * 64-bit hash — distinct-preserving up to a negligible collision rate
    * (far under HLL's own ~2% error), with none of the per-row string
    * formatting a cast would pay. Nulls stay null so the sketch ignores
    * them (NDV excludes null, the `ColumnStat.distinctCount` convention). */
  private def sketchAgg(df: DataFrame, c: String): org.apache.spark.sql.Column = {
    val base = df.col(s"`$c`")
    val input = df.schema.fields.find(_.name == c).get.dataType match {
      case IntegerType | LongType | StringType => base
      case ByteType | ShortType => base.cast("long")
      case _ => org.apache.spark.sql.functions.when(
        base.isNotNull, org.apache.spark.sql.functions.xxhash64(base))
    }
    hll_sketch_agg(input).as(c)
  }

  /** Explicit (re)build of the LIVE snapshot's sketch by scanning the
    * table — the Iceberg ANALYZE shape, for tables whose commits never
    * carried one (streaming-sink tables, history written before the
    * stats existed, opted-out writers) and the one path that SUBTRACTS:
    * the scan applies deletes, so a churned table's upper bound resets
    * to truth. One distributed pass; the sketch publishes at the live
    * version. Returns the per-column estimates (physical names). */
  def computeStats(spark: org.apache.spark.sql.SparkSession,
                   root: String): Map[String, Long] = {
    val v = ManifestTable.currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no committed version under $root"))
    val df = ManifestTable.read(spark, root)
    val cols = sketchable(df.schema)
    if (cols.isEmpty) return Map.empty
    val aggs = cols.map(c => sketchAgg(df, c))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val m = cols.zipWithIndex.collect {
      case (c, i) if !row.isNullAt(i) => c -> row.getAs[Array[Byte]](i)
    }.toMap
    if (m.nonEmpty) write(root, v, m)
    m.map { case (k, b) => k -> estimate(b) }
  }

  /** Harvest sketch bytes after the write action completed. The metric
    * row is already resolved by then, so the await returns immediately;
    * the short timeout guards the edge where the listener never fires —
    * a missed observation skips the stats update, never fails or stalls
    * the commit. */
  def harvest(obs: Option[Observation]): Option[Map[String, Array[Byte]]] =
    obs.map { o =>
      val row = Try(scala.concurrent.Await.result(
        o.future, scala.concurrent.duration.Duration(10, "s")))
      row.toOption.toSeq.flatMap { r =>
        r.schema.fieldNames.zipWithIndex.collect {
          case (name, i) if !r.isNullAt(i) &&
              r.get(i).isInstanceOf[Array[Byte]] =>
            name -> r.getAs[Array[Byte]](i)
        }
      }.toMap
    }.filter(_.nonEmpty)

  /** HLL union of two sketch maps, column-wise; a column present on one
    * side only carries through (schema evolution). */
  def merge(a: Map[String, Array[Byte]],
            b: Map[String, Array[Byte]]): Map[String, Array[Byte]] = {
    import org.apache.datasketches.hll.{HllSketch, Union}
    (a.keySet ++ b.keySet).map { k =>
      val bytes = (a.get(k).toSeq ++ b.get(k).toSeq) match {
        case Seq(one) => one
        case both =>
          val u = new Union(12)
          both.foreach(x => u.update(HllSketch.heapify(x)))
          u.getResult.toCompactByteArray
      }
      k -> bytes
    }.toMap
  }

  def estimate(bytes: Array[Byte]): Long =
    Try(math.round(
      org.apache.datasketches.hll.HllSketch.heapify(bytes).getEstimate))
      .getOrElse(0L)

  private def path(root: String, version: Long) = s"$root/$Dir/$version"

  private def encodeBody(m: Map[String, Array[Byte]]): String =
    m.toSeq.sortBy(_._1).map { case (name, bytes) =>
      val n = java.net.URLEncoder.encode(name, StandardCharsets.UTF_8)
      s"$n\t${Base64.getEncoder.encodeToString(bytes)}"
    }.mkString("\n")

  /** An EMPTY map is a meaningful sentinel: "this snapshot's NDV is
    * unknown AND the parent's does not apply" (a full replacement whose
    * writer carried no sketch) — it stops the [[forVersion]] walk. */
  def write(root: String, version: Long, m: Map[String, Array[Byte]]): Unit =
    MetaIO.writeAtomic(path(root, version), encodeBody(m))

  /** Create-only variant (gc's lineage pin): never overwrites — a racing
    * commit's own (richer, merged) sketch must win whatever the order. */
  def writeIfAbsent(root: String, version: Long,
                    m: Map[String, Array[Byte]]): Unit =
    Try(MetaIO.createNew(path(root, version), encodeBody(m)))

  def read(root: String, version: Long): Option[Map[String, Array[Byte]]] =
    if (!MetaIO.exists(path(root, version))) None
    else Try {
      MetaIO.readString(path(root, version)).split('\n').filter(_.nonEmpty).map { l =>
        val Array(n, b) = l.split('\t')
        java.net.URLDecoder.decode(n, StandardCharsets.UTF_8) ->
          Base64.getDecoder.decode(b)
      }.toMap
    }.toOption

  def delete(root: String, version: Long): Unit =
    Try(if (MetaIO.exists(path(root, version))) MetaIO.delete(path(root, version)))

  /** Nearest at-or-below-ancestor sketch of `version` by parent-stamp
    * walk (delete/metadata commits write no sketch of their own). The
    * walk is bounded; a break (expired/pre-stamp manifest) answers None
    * — planning simply runs without NDV. */
  def forVersion(root: String, version: Long): Option[Map[String, Array[Byte]]] = {
    var v = version
    var hops = 0
    while (hops < 64) {
      read(root, v) match {
        case some @ Some(_) => return some
        case None =>
          ManifestTable.parentOf(root, v) match {
            case Some(p) if p > 0 && p < v => v = p; hops += 1
            case _ => return None
          }
      }
    }
    None
  }

  /** Case-insensitive NDV estimates of a snapshot's nearest sketch. */
  def estimates(root: String, version: Long): Map[String, Long] =
    forVersion(root, version).getOrElse(Map.empty).map {
      case (k, v) => k.toLowerCase -> estimate(v)
    }
}

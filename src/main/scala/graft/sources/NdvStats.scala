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
  * `spark.graft.stats.ndv=false` opts a session's writes out.
  *
  * The upper bound can go STALE in the other direction: a data commit
  * whose Observation harvest failed (or whose writer opted out) writes
  * no sidecar, and because every later merge is parent∪fresh, that
  * batch's distinct values stay excluded from the table NDV until
  * `compute_stats` (the explicit full-scan rebuild — the remediation)
  * or a full rewrite re-bases the sketch. [[resolve]] detects the gap
  * (a row-adding commit between the resolved sidecar and the read
  * version) and `tbl.stats` surfaces it as `stale`, so the under-count
  * is visible, never silent. */
object NdvStats {

  val Dir = "_stats"

  /** Sidecar-key suffix of a column's KLL QUANTILE sketch (the
    * histogram tier riding the same Observation, sidecar, merge, and
    * parent-walk as the HLL NDV sketch). The \\u0001 separator is
    * illegal in column names, so a real column can never collide. */
  private[graft] val KllSuffix = "\u0001kll"

  private def conf = org.apache.spark.sql.internal.SQLConf.get

  def enabled: Boolean =
    Try(conf.getConfString("spark.graft.stats.ndv", "true").toBoolean).getOrElse(true)

  /** The histogram tier: commit-time KLL quantile sketches per numeric/
    * date/timestamp column, surfaced as equi-height histograms through
    * `ColumnStatistics.histogram()` for skewed-predicate selectivity
    * (what NDV+bounds-only estimation gets wrong — a range predicate
    * over a skewed column interpolates uniformly). Off switches both
    * the write-side sketch and the read-side report. */
  def histogramEnabled: Boolean =
    Try(conf.getConfString("spark.graft.stats.histogram", "true").toBoolean)
      .getOrElse(true)

  /** Sketch-column cap: very wide tables sketch only the first N
    * atomic columns (observation cost is per row × per column). */
  private def maxColumns: Int =
    Try(conf.getConfString("spark.graft.stats.ndv.maxColumns", "48").toInt).getOrElse(48)

  /** Write-path KLL sampling stride: ~1/N of each partition's rows feed
    * the quantile sketches (1 = exact), selected by an aperiodic hash of
    * the row ordinal — NOT a fixed `ordinal % N` phase, which is biased
    * whenever the write order is periodic with a period sharing a factor
    * with N (an `id % 4`-derived column written in order would yield a
    * degenerate single-value histogram). Quantiles are estimates by
    * construction — k=200's ~1.65% rank error dominates the hash-
    * sampling error on any write big enough to matter — and the stride
    * divides the histogram tier's per-row write tax by N. compute_stats
    * rebuilds stay exact (a full scan whose aggregate is codegen'd pays
    * nothing per extra row). */
  private def histogramSampleStride: Int =
    Try(conf.getConfString("spark.graft.stats.histogram.sample", "4").toInt)
      .getOrElse(4).max(1)

  /** Histogram-column cap (KLL updates cost more than HLL's). */
  private def maxHistColumns: Int =
    Try(conf.getConfString("spark.graft.stats.histogram.maxColumns", "24").toInt)
      .getOrElse(24)

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

  /** An attached-but-unharvested statistics observation: the metric
    * handle plus the ordered sidecar keys its single `array<binary>`
    * result zips back to. */
  case class Pending(obs: Observation, keys: Seq[String])

  /** Attach the NDV observation to a write DataFrame. Returns the df to
    * write and the pending handle to harvest after the action (None when
    * disabled or nothing is sketchable). `allowed` restricts sketching
    * to the named columns (hidden partition derivations opt out).
    * `ndvOverride`/`histOverride` are the TABLE's `stats.ndv` /
    * `stats.histogram` properties — a write-mostly table opts its own
    * writes out of the sketch tax without touching the session default
    * ([[graft.sources.ManifestTable.statsOpts]]).
    *
    * The whole tier rides ONE fused aggregate
    * ([[graft.functions.GraftStatsAgg]]): CollectMetrics evaluates
    * imperative aggregates with interpreted child evaluation and
    * per-aggregate dispatch, so N+M separate sketch aggregates taxed
    * every written row ~N+M times; fused, the row pays one codegen'd
    * projection and one buffer visit. */
  def attach(df: DataFrame, allowed: Set[String] = Set.empty,
             ndvOverride: Option[Boolean] = None,
             histOverride: Option[Boolean] = None)
      : (DataFrame, Option[Pending]) = {
    if (!ndvOverride.getOrElse(enabled)) return (df, None)
    val cols = sketchable(df.schema)
      .filter(c => allowed.isEmpty || allowed.contains(c))
    if (cols.isEmpty) return (df, None)
    val obs = Observation(
      s"graft_ndv_${java.util.UUID.randomUUID().toString.take(12)}")
    // the histogram tier rides the SAME observation and the SAME fused
    // aggregate: one KLL feed per numeric/date/timestamp column, keyed
    // by the reserved suffix
    val histCols =
      if (!histOverride.getOrElse(histogramEnabled)) Nil
      else cols.filter(c => graft.functions.KllDoublesAgg.supports(
        df.schema.fields.find(_.name == c).get.dataType)).take(maxHistColumns)
    val inputs =
      cols.map(c => org.apache.spark.sql.GraftColumnBridge.expression(hllInput(df, c))) ++
        histCols.map(c => org.apache.spark.sql.GraftColumnBridge.expression(df.col(s"`$c`")))
    val fused = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.GraftStatsAgg(inputs, nHll = cols.size,
        kllStride = histogramSampleStride)
        .toAggregateExpression()).as("graft_stats")
    (df.observe(obs, fused),
      Some(Pending(obs, cols ++ histCols.map(_ + KllSuffix))))
  }

  /** The KLL quantile-sketch aggregate for one column, keyed by the
    * sidecar suffix so [[harvest]]/[[merge]] route it to KLL union. */
  private def kllAgg(df: DataFrame, c: String): org.apache.spark.sql.Column = {
    val child = org.apache.spark.sql.GraftColumnBridge.expression(df.col(s"`$c`"))
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.KllDoublesAgg(child).toAggregateExpression())
      .as(c + KllSuffix)
  }

  /** The HLL feed column for one source column. int/long/string feed
    * natively; everything else feeds as a codegen'd 64-bit hash —
    * distinct-preserving up to a negligible collision rate (far under
    * HLL's own ~2% error), with none of the per-row string formatting a
    * cast would pay. Nulls stay null so the sketch ignores them (NDV
    * excludes null, the `ColumnStat.distinctCount` convention). The SAME
    * transformation feeds the per-column `hll_sketch_agg` (compute_stats
    * rebuilds) and the fused write-path aggregate, so sketches from
    * either writer union consistently. */
  private def hllInput(df: DataFrame, c: String): org.apache.spark.sql.Column = {
    val base = df.col(s"`$c`")
    df.schema.fields.find(_.name == c).get.dataType match {
      case IntegerType | LongType | StringType => base
      case ByteType | ShortType => base.cast("long")
      case _ => org.apache.spark.sql.functions.when(
        base.isNotNull, org.apache.spark.sql.functions.xxhash64(base))
    }
  }

  /** The per-column sketch aggregate (the compute_stats scan path — a
    * normal codegen'd aggregate, where per-column aggs cost nothing
    * extra). */
  private def sketchAgg(df: DataFrame, c: String): org.apache.spark.sql.Column =
    hll_sketch_agg(hllInput(df, c)).as(c)

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
    // the histogram tier re-bases in the same pass (quantiles subtract
    // the same way NDV does: the scan applies deletes)
    val histCols =
      if (!histogramEnabled) Nil
      else cols.filter(c => graft.functions.KllDoublesAgg.supports(
        df.schema.fields.find(_.name == c).get.dataType)).take(maxHistColumns)
    val named = cols.map(c => c -> sketchAgg(df, c)) ++
      histCols.map(c => (c + KllSuffix) -> kllAgg(df, c))
    val aggs = named.map(_._2)
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val m = named.map(_._1).zipWithIndex.collect {
      case (c, i) if !row.isNullAt(i) => c -> row.getAs[Array[Byte]](i)
    }.toMap
    if (m.nonEmpty) write(root, v, m)
    m.collect { case (k, b) if !k.endsWith(KllSuffix) => k -> estimate(b) }
  }

  /** Harvest sketch bytes after the write action completed. The metric
    * row is already resolved by then, so the await returns immediately;
    * the short timeout guards the edge where the listener never fires —
    * a missed observation skips the stats update, never fails or stalls
    * the commit. The fused aggregate's single `array<binary>` result
    * zips back to the pending keys in order. */
  def harvest(pending: Option[Pending]): Option[Map[String, Array[Byte]]] =
    pending.map { p =>
      val row = Try(scala.concurrent.Await.result(
        p.obs.future, scala.concurrent.duration.Duration(10, "s")))
      row.toOption.toSeq.flatMap { r =>
        if (r.isNullAt(0)) Nil
        else {
          val parts = r.getSeq[Array[Byte]](0)
          if (parts.length != p.keys.length) Nil
          else p.keys.zip(parts).filter(_._2 != null)
        }
      }.toMap
    }.filter(_.nonEmpty)

  /** Sketch union of two sidecar maps, column-wise (HLL union for NDV
    * keys, KLL merge for suffix-keyed quantile sketches); a column
    * present on one side only carries through (schema evolution). */
  def merge(a: Map[String, Array[Byte]],
            b: Map[String, Array[Byte]]): Map[String, Array[Byte]] = {
    import org.apache.datasketches.hll.{HllSketch, Union}
    (a.keySet ++ b.keySet).map { k =>
      val bytes = (a.get(k).toSeq ++ b.get(k).toSeq) match {
        case Seq(one) => one
        case both if k.endsWith(KllSuffix) =>
          both.reduce(graft.functions.KllDoublesAgg.mergeBytes)
        case both =>
          val u = new Union(12)
          both.foreach(x => u.update(HllSketch.heapify(x)))
          u.getResult.toCompactByteArray
      }
      k -> bytes
    }.toMap
  }

  /** Align the histogram tier before a commit merge: a parent KLL key
    * with no fresh counterpart means this commit's rows were never
    * quantile-sketched (histogram tier switched off, or the column fell
    * out of the cap) — carrying the parent's bins forward one-sided
    * would present a distribution that misses every new row with NO
    * stale signal (the gap detector only sees missing sidecars).
    * Dropping them resets the histogram honestly; NDV keys pass
    * untouched (one-sided HLL is the marked-stale under-count path).
    * Deliberately NOT inside [[merge]]: gc's lineage republish copies a
    * resolved sidecar verbatim, where one-sided KLL must survive. */
  def alignHistogram(parent: Map[String, Array[Byte]],
                     fresh: Map[String, Array[Byte]]): Map[String, Array[Byte]] =
    parent.filter { case (k, _) => !k.endsWith(KllSuffix) || fresh.contains(k) }

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

  /** First line of a sidecar whose sketch is known to UNDER-COUNT (a
    * republished inherit that had already skipped a row-adding commit):
    * the marker survives gc's lineage republish, so [[resolve]] keeps
    * reporting stale even after the gap's manifests expire. */
  private val StaleMarker = "#stale"

  /** An EMPTY map is a meaningful sentinel: "this snapshot's NDV is
    * unknown AND the parent's does not apply" (a full replacement whose
    * writer carried no sketch) — it stops the [[forVersion]] walk. */
  def write(root: String, version: Long, m: Map[String, Array[Byte]],
            stale: Boolean = false): Unit =
    MetaIO.writeAtomic(path(root, version),
      (if (stale) StaleMarker + "\n" else "") + encodeBody(m))

  /** Create-only variant (gc's lineage pin): never overwrites — a racing
    * commit's own (richer, merged) sketch must win whatever the order. */
  def writeIfAbsent(root: String, version: Long, m: Map[String, Array[Byte]],
                    stale: Boolean = false): Unit =
    Try(MetaIO.createNew(path(root, version),
      (if (stale) StaleMarker + "\n" else "") + encodeBody(m)))

  def read(root: String, version: Long): Option[Map[String, Array[Byte]]] =
    readWithStale(root, version).map(_._1)

  def readWithStale(root: String, version: Long)
      : Option[(Map[String, Array[Byte]], Boolean)] =
    if (!MetaIO.exists(path(root, version))) None
    else Try {
      val lines = MetaIO.readString(path(root, version))
        .split('\n').filter(_.nonEmpty)
      val stale = lines.headOption.contains(StaleMarker)
      val body = if (stale) lines.tail else lines
      body.map { l =>
        val Array(n, b) = l.split('\t')
        java.net.URLDecoder.decode(n, StandardCharsets.UTF_8) ->
          Base64.getDecoder.decode(b)
      }.toMap -> stale
    }.toOption

  def delete(root: String, version: Long): Unit =
    Try(if (MetaIO.exists(path(root, version))) MetaIO.delete(path(root, version)))

  /** Commit labels that ADD rows: a sketch-less gap of one of these
    * between a resolved sidecar and the read version means the gap's
    * distinct values are missing from the estimate (see class doc).
    * delete/rollback/rewrite gaps are NOT stale — the inherited sketch
    * stays a correct upper bound without them (and a sketch-less full
    * rewrite writes the empty sentinel, stopping the walk anyway). */
  private val RowAddingOps =
    Set("append", "update", "stream", "cherrypick", "replace", "overwrite")

  /** A resolved sketch: the sidecar's own version, its sketches, the
    * parent-walk distance, and whether the estimate is STALE (a
    * row-adding commit in the gap carried no sketch, or the sidecar
    * itself is marker-stamped). */
  case class Resolved(version: Long, sketches: Map[String, Array[Byte]],
                      hops: Int, stale: Boolean)

  /** Nearest at-or-below-ancestor sidecar of `version` by parent-stamp
    * walk (delete/metadata commits write no sketch of their own),
    * gap-classified for staleness. The walk is bounded; a break
    * (expired/pre-stamp manifest) answers None — planning simply runs
    * without NDV. */
  def resolve(root: String, version: Long): Option[Resolved] = {
    var v = version
    var hops = 0
    var stale = false
    while (hops < 64) {
      readWithStale(root, v) match {
        case Some((m, marked)) => return Some(Resolved(v, m, hops, stale || marked))
        case None =>
          // no sidecar at v: if v's commit added rows, anything inherited
          // from below it under-counts (pre-label manifests: op unknown —
          // conservatively stale)
          if (RowAddingOps.contains(
              ManifestTable.opOf(root, v).getOrElse("overwrite")))
            stale = true
          ManifestTable.parentOf(root, v) match {
            case Some(p) if p > 0 && p < v => v = p; hops += 1
            case _ => return None
          }
      }
    }
    None
  }

  /** Nearest-ancestor sketch map of `version` ([[resolve]]). */
  def forVersion(root: String, version: Long): Option[Map[String, Array[Byte]]] =
    resolve(root, version).map(_.sketches)

  /** [[resolve]] for the COMMIT LOOP's parent merge, closing the
    * sidecar-lag race: a sidecar publishes moments AFTER its commit's
    * pointer flip, so a racer that rebased onto the fresh version can
    * resolve PAST it to an ancestor — the merged head sketch would then
    * silently drop the sibling's values (an under-count, violating the
    * upper-bound invariant). When `version` itself has no sidecar yet
    * but its op added rows, wait briefly for the sibling's write; if it
    * still never lands (opted-out writer, crashed harvest), fall through
    * to the plain resolve — whose gap detection marks the result STALE,
    * so the residual under-count stays visible, never silent. */
  def resolveFresh(root: String, version: Long): Option[Resolved] = {
    // the lag race only exists for a JUST-flipped sibling: an old
    // parent manifest whose sidecar never came (opted-out writer,
    // crashed harvest) will never produce one — don't burn 600 ms per
    // commit polling for it (it falls through stale-marked regardless)
    def worthWaiting: Boolean =
      readWithStale(root, version).isEmpty &&
        RowAddingOps.contains(
          ManifestTable.opOf(root, version).getOrElse("overwrite")) &&
        ManifestTable.manifestMtimeMillis(root, version)
          .exists(_ > System.currentTimeMillis() - 10000L)
    var attempts = 0
    while (attempts < 6 && worthWaiting) {
      Thread.sleep(100L)
      attempts += 1
    }
    resolve(root, version)
  }

  /** Case-insensitive NDV estimates of a snapshot's nearest sketch
    * (quantile-sketch keys are the histogram tier's, not NDV). */
  def estimates(root: String, version: Long): Map[String, Long] =
    forVersion(root, version).getOrElse(Map.empty).collect {
      case (k, v) if !k.endsWith(KllSuffix) => k.toLowerCase -> estimate(v)
    }

  /** Case-insensitive KLL quantile sketches of a snapshot's nearest
    * sidecar — the histogram tier's read surface. */
  def kllSketches(root: String, version: Long): Map[String, Array[Byte]] =
    forVersion(root, version).getOrElse(Map.empty).collect {
      case (k, v) if k.endsWith(KllSuffix) =>
        k.stripSuffix(KllSuffix).toLowerCase -> v
    }
}

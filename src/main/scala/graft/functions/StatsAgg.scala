package graft.functions

import org.apache.datasketches.hll.HllSketch
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** All of a write's statistics sketches as ONE aggregate — the fused
  * form of N× `hll_sketch_agg` + M× [[KllDoublesAgg]] riding a write
  * job's `Observation` ([[graft.sources.NdvStats.attach]]).
  *
  * Why fused: `CollectMetrics` evaluates imperative aggregates one at a
  * time per input row — per-column aggregates pay N× generic dispatch,
  * buffer boxing, and INTERPRETED child evaluation (the xxhash64 feed
  * for non-native types never reaches codegen there). This aggregate
  * pays all of that once: a single buffer holds every sketch, and ONE
  * codegen-compiled [[UnsafeProjection]] evaluates every input column
  * per row — measured at sf0.1, it cuts the write-path statistics tax
  * from ~35% to single digits without dropping any sketch.
  *
  * The first `nHll` children are the HLL feeds (already transformed to
  * int/long/string by the caller, exactly as the per-column
  * `hll_sketch_agg` calls fed — so sketches UNION consistently across
  * writer generations); the remaining children are the KLL feeds (raw
  * numeric/date/timestamp columns, converted to the double domain
  * `FilterEstimation` compares in). HLL updates replicate Spark's
  * `HllSketchAgg` exactly: ints/longs via `update(long)`, strings via
  * their UTF-8 bytes with EMPTY strings skipped — a sketch this
  * aggregate builds and one `hll_sketch_agg` built from the same rows
  * estimate identically after union.
  *
  * Evaluates to `array<binary>`: the HLL images (compact bytes, the
  * sidecar format) followed by the KLL images, in children order — the
  * caller zips them back to column names. */
case class GraftStatsAgg(inputs: Seq[Expression], nHll: Int,
                         kllStride: Int = 1,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GraftStatsAgg.Buf] {

  override def children: Seq[Expression] = inputs
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = false

  // ONE codegen'd projection evaluates every feed column per row —
  // compiled once per task, cached by Spark's codegen cache
  @transient private lazy val proj: UnsafeProjection =
    UnsafeProjection.create(inputs.toArray)

  // per-HLL-child feeder, resolved once (closure over the ordinal)
  @transient private lazy val hllFeeds: Array[(InternalRow, HllSketch) => Unit] =
    inputs.take(nHll).zipWithIndex.map { case (e, i) =>
      e.dataType match {
        case IntegerType => (r: InternalRow, s: HllSketch) =>
          if (!r.isNullAt(i)) s.update(r.getInt(i).toLong)
        case LongType => (r: InternalRow, s: HllSketch) =>
          if (!r.isNullAt(i)) s.update(r.getLong(i))
        case _: StringType => (r: InternalRow, s: HllSketch) =>
          if (!r.isNullAt(i)) {
            val b = r.getUTF8String(i).getBytes
            if (b.length > 0) s.update(b) // HllSketchAgg skips empties
          }
        case other => throw new IllegalStateException(
          s"GraftStatsAgg HLL feed must be int/long/string, got $other")
      }
    }.toArray

  // per-KLL-child feeder into the EstimationUtils.toDouble domain
  @transient private lazy val kllFeeds: Array[(InternalRow, KllDoublesSketch) => Unit] =
    inputs.drop(nHll).zipWithIndex.map { case (e, j) =>
      val i = nHll + j
      val get: InternalRow => Double = e.dataType match {
        // compact decimals (p ≤ 18) live as an unscaled long in the
        // projected UnsafeRow's fixed region — read it directly and
        // scale, instead of materializing a Decimal + BigDecimal per
        // row (the dominant KLL cost on decimal-heavy fact tables)
        case d: DecimalType if d.precision <= org.apache.spark.sql.types.Decimal.MAX_LONG_DIGITS =>
          val factor = math.pow(10, -d.scale)
          r => r.getLong(i) * factor
        case d: DecimalType =>
          r => r.getDecimal(i, d.precision, d.scale).toDouble
        case ByteType => r => r.getByte(i).toDouble
        case ShortType => r => r.getShort(i).toDouble
        case IntegerType | DateType => r => r.getInt(i).toDouble
        case LongType | TimestampType | TimestampNTZType => r => r.getLong(i).toDouble
        case FloatType => r => r.getFloat(i).toDouble
        case DoubleType => r => r.getDouble(i)
        case other => throw new IllegalStateException(
          s"GraftStatsAgg KLL feed must be numeric/date/timestamp, got $other")
      }
      (r: InternalRow, s: KllDoublesSketch) => if (!r.isNullAt(i)) s.update(get(r))
    }.toArray

  override def createAggregationBuffer(): GraftStatsAgg.Buf =
    GraftStatsAgg.Buf(
      Array.fill(nHll)(new HllSketch(12)),
      Array.fill(inputs.length - nHll)(KllDoublesSketch.newHeapInstance(200)))

  override def update(buf: GraftStatsAgg.Buf, input: InternalRow): GraftStatsAgg.Buf = {
    val row = proj(input)
    var i = 0
    while (i < hllFeeds.length) { hllFeeds(i)(row, buf.hll(i)); i += 1 }
    // the KLL tier SAMPLES ~1/kllStride of the rows per partition:
    // quantile estimation needs a representative sample, not every row —
    // the sketch's own k=200 rank error (~1.65%) dominates the sampling
    // error on any write large enough for a histogram to matter, and the
    // stride divides the dominant write-path statistics cost by the same
    // factor. Selection is by a HASH of the row's ordinal, not a fixed
    // `seen % stride == 0` phase: systematic (fixed-phase) sampling is
    // biased whenever the write order is periodic with a period sharing
    // a factor with the stride — an `id % 4`-derived column written in
    // order would feed a degenerate single-value histogram. The ordinal
    // hash (splitmix64) is aperiodic, so no data period can align with
    // it, and stays deterministic for a given row order (stable specs,
    // stable plan verdicts). NDV never samples (distinct counts from
    // samples are biased).
    if (kllFeeds.length > 0) {
      if (kllStride == 1 || GraftStatsAgg.sampleAt(buf.seen, kllStride)) {
        var j = 0
        while (j < kllFeeds.length) { kllFeeds(j)(row, buf.kll(j)); j += 1 }
      }
      buf.seen += 1
    }
    buf
  }

  override def merge(a: GraftStatsAgg.Buf, b: GraftStatsAgg.Buf): GraftStatsAgg.Buf = {
    val hll = a.hll.zip(b.hll).map { case (x, y) =>
      val u = new org.apache.datasketches.hll.Union(12)
      u.update(x); u.update(y)
      HllSketch.heapify(u.getResult.toUpdatableByteArray)
    }
    a.kll.zip(b.kll).foreach { case (x, y) => x.merge(y) }
    GraftStatsAgg.Buf(hll, a.kll)
  }

  override def eval(buf: GraftStatsAgg.Buf): Any =
    new GenericArrayData(
      (buf.hll.map(_.toCompactByteArray) ++ buf.kll.map(_.toByteArray))
        .map(x => x: Any))

  override def serialize(buf: GraftStatsAgg.Buf): Array[Byte] = {
    val parts = buf.hll.map(_.toUpdatableByteArray) ++ buf.kll.map(_.toByteArray)
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeInt(buf.hll.length); d.writeInt(buf.kll.length)
    parts.foreach { p => d.writeInt(p.length); d.write(p) }
    d.flush(); out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GraftStatsAgg.Buf = {
    val d = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val nH = d.readInt(); val nK = d.readInt()
    def part(): Array[Byte] = {
      val b = new Array[Byte](d.readInt()); d.readFully(b); b
    }
    GraftStatsAgg.Buf(
      Array.fill(nH)(HllSketch.heapify(part())),
      Array.fill(nK)(KllDoublesSketch.heapify(Memory.wrap(part()))))
  }

  override def withNewMutableAggBufferOffset(n: Int): GraftStatsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): GraftStatsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftStatsAgg =
    copy(inputs = newChildren)
  override def prettyName: String = "graft_stats_sketch"
}

object GraftStatsAgg {
  /** One buffer for the whole statistics tier: every HLL and KLL sketch
    * of the write, updated in a single pass per row. `seen` drives the
    * KLL sampling stride (per partition; not serialized — a buffer only
    * serializes after its partition's rows are consumed). */
  case class Buf(hll: Array[HllSketch], kll: Array[KllDoublesSketch],
                 var seen: Long = 0L)

  /** Deterministic aperiodic row selection for the KLL sampling tier:
    * splitmix64 of the row's partition-local ordinal, keeping ~1/stride
    * of rows. Unlike a fixed-phase `ordinal % stride == 0`, no periodic
    * write order can align with the kept set (the hash sequence has no
    * period), so a round-robin or modulus-derived column can never
    * collapse the histogram to one residue class's values. */
  def sampleAt(ordinal: Long, stride: Int): Boolean = {
    var z = ordinal + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    java.lang.Long.remainderUnsigned(z, stride.toLong) == 0L
  }
}

package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KLL quantile sketch aggregate (Apache DataSketches `KllDoublesSketch`)
  * — the mergeable building block for commit-time equi-height histograms
  * ([[graft.sources.NdvStats]]), the statistics tier Spark's own ANALYZE
  * builds with `spark.sql.statistics.histogram.enabled` and
  * FilterEstimation consumes for skewed-predicate selectivity. A custom
  * [[TypedImperativeAggregate]] because Spark ships HLL sketch aggregates
  * but no KLL one; shaped exactly like `HllSketchAgg` (update into a heap
  * sketch, merge by sketch union, evaluate/serialize to the compact byte
  * image), so it rides an `Observation` on the write job the same way.
  *
  * Inputs convert to the DOUBLE domain `FilterEstimation` compares
  * histogram bins in (`EstimationUtils.toDouble`): numerics by value,
  * dates as epoch DAYS, timestamps as epoch MICROS — the INTERNAL
  * catalyst representations, read straight off the row (no Cast node, so
  * date/timestamp columns need no cast legality carve-outs). Nulls are
  * ignored (histograms describe non-null values). K=200 ≈ 1.65% rank
  * error at a few KB per column. */
case class KllDoublesAgg(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (KllDoublesAgg.supports(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_kll_sketch needs a numeric/date/timestamp input, got ${child.dataType}")

  // resolved once per task; the internal value → double domain of
  // EstimationUtils.toDouble (dates are Int days, timestamps Long micros)
  @transient private lazy val toDouble: Any => Double = child.dataType match {
    case _: DecimalType => v => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case ByteType => v => v.asInstanceOf[Byte].toDouble
    case ShortType => v => v.asInstanceOf[Short].toDouble
    case IntegerType | DateType => v => v.asInstanceOf[Int].toDouble
    case LongType | TimestampType | TimestampNTZType => v => v.asInstanceOf[Long].toDouble
    case FloatType => v => v.asInstanceOf[Float].toDouble
    case DoubleType => v => v.asInstanceOf[Double]
    case other => throw new IllegalStateException(s"unsupported kll input $other")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(200)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(toDouble(v))
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllDoublesAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_kll_sketch"
}

object KllDoublesAgg {
  /** The types histograms estimate over — FilterEstimation's own list. */
  def supports(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** KLL union of two serialized sketches. */
  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val s = KllDoublesSketch.heapify(Memory.wrap(a))
    s.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
    s.toByteArray
  }
}

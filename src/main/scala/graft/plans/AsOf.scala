package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** AS-OF join: for each left row, attach the latest right row with the
  * same key whose timestamp is <= the left row's timestamp.
  *
  * This is the operator behind the reference's temporal EAV pattern —
  * "which attribute_value was valid when this transaction happened"
  * (`f_contract_attributes.valid_from`, reference `sql/model.md:91-99`) —
  * and Spark SQL has no native form of it. Two implementations:
  *
  *  1. [[AsOf.asofJoinComposed]] — pure built-in composition (equi-join on
  *     key + `ts_r <= ts_l` + ROW_NUMBER pick-latest). Correct everywhere,
  *     but materializes every (left, earlier-right) pair before pruning:
  *     with R right rows per key it does O(L·R) join work.
  *  2. [[AsOf.asofJoin]] — a custom Catalyst operator (LogicalPlan +
  *     Strategy + SparkPlan). Both sides hash-cluster on the key and sort
  *     by (key, ts); a single streaming merge pass per partition emits
  *     each left row exactly once with its match: O(L + R) after the
  *     shuffle, no intermediate blow-up. This is the plan shape a 100 TB
  *     as-of backfill needs.
  *
  * The physical operator is deliberately scoped to a LONG key and
  * LONG/TIMESTAMP timestamps (covers id-keyed fact/dim joins); the
  * composed form has no restriction. Both are differential-tested against
  * each other in AsOfSpec.
  */
object AsOf {

  /** Built-in composition: equi-join + temporal filter + pick-latest.
    * Left rows with no match are preserved (null right columns). Output is
    * left columns ++ all right columns (same shape as the custom path). */
  def asofJoinComposed(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String): DataFrame = {
    val joined = left.join(right,
      left(key) === right(key) && right(rightTs) <= left(leftTs), "left")
    val w = Window.partitionBy(left(key), left(leftTs))
      .orderBy(right(rightTs).desc_nulls_last)
    joined.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Custom-operator path. Requires: `key` resolves to LongType on both
    * sides; `leftTs`/`rightTs` are LONG or TIMESTAMP. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    // idempotently register the planner strategy on this session
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy

    val lPlan = GraftColumnBridge.analyzed(left)
    val rPlan0 = GraftColumnBridge.analyzed(right)
    // self-join hygiene: if both sides derive from the same source they
    // share expression IDs; re-alias the right side with fresh IDs (the
    // dedup the analyzer does for Join nodes, done here by hand)
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rPlan0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rPlan0)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    GraftColumnBridge.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan,
        attr(lPlan, key), attr(rPlan, key),
        attr(lPlan, leftTs), attr(rPlan, rightTs)))
  }

  /** Driver-contract query: each event as-of joined to the latest earlier
    * "profile update" (every 5th event) of the same user — exercises the
    * custom operator end-to-end against DuckDB's native ASOF JOIN. */
  def asofUserProfile(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables.events(spark, dir)
    val l = e.select(col("event_id"), col("user_id"), col("ts"))
    val r = e.where(col("event_id") % 5 === 0)
      .select(col("user_id"), col("ts").as("valid_from"), col("props").as("profile"))
    asofJoin(l, r, "user_id", "ts", "valid_from")
      .toDF("event_id", "user_id", "ts", "r_user_id", "valid_from", "profile")
      .drop("r_user_id")
  }

  val asofUserProfileOracle: String =
    s"""WITH l AS (SELECT event_id, user_id, ts FROM events),
       |r AS (SELECT user_id AS r_user, ts AS valid_from, props AS profile
       |      FROM events WHERE event_id % 5 = 0)
       |SELECT l.event_id, l.user_id, l.ts, r.valid_from, r.profile
       |FROM l ASOF LEFT JOIN r ON l.user_id = r.r_user AND l.ts >= r.valid_from""".stripMargin
}

/** Logical node: constructed from already-analyzed children, so it carries
  * resolved attributes and needs no extra resolution rule. */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan = copy(left = l, right = r)
}

object AsOfStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: children hash-clustered on the key and sorted by
  * (key, ts); one streaming merge per partition.
  *
  * Merge invariant: both iterators ascend by (key, ts). For each left row
  * we advance the right cursor through all rows with (rKey < lKey) or
  * (rKey == lKey && rTs <= lTs), remembering the last row whose key
  * matched — that remembered row is by construction the latest match. */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey), requireAllClusterKeys = true),
    ClusteredDistribution(Seq(rightKey), requireAllClusterKeys = true))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  private def boundLong(e: Expression, attrs: Seq[Attribute]): Expression = {
    require(e.dataType == LongType || e.dataType == TimestampType ||
      e.dataType.typeName == "timestamp_ntz",
      s"AsOfJoinExec supports LONG/TIMESTAMP cols, got ${e.dataType}")
    BindReferences.bindReference(e, attrs)
  }

  override protected def doExecute(): RDD[InternalRow] = {
    // bound Expressions serialize to executors; the codegen'd projection
    // must be instantiated per-partition (generated classes don't)
    val lKeyB = boundLong(leftKey, left.output)
    val rKeyB = boundLong(rightKey, right.output)
    val lTsB  = boundLong(leftTs, left.output)
    val rTsB  = boundLong(rightTs, right.output)
    val rightLen = right.output.length
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      def lKeyF(r: InternalRow) = lKeyB.eval(r).asInstanceOf[Long]
      def rKeyF(r: InternalRow) = rKeyB.eval(r).asInstanceOf[Long]
      def lTsF(r: InternalRow)  = lTsB.eval(r).asInstanceOf[Long]
      def rTsF(r: InternalRow)  = rTsB.eval(r).asInstanceOf[Long]
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rightLen)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // last right row whose key matched the current left key, ts <= left ts
      var lastKey = Long.MinValue
      var lastRow: InternalRow = null

      lIter.map { lRow =>
        val lk = lKeyF(lRow)
        val lt = lTsF(lRow)
        if (lk != lastKey) { lastRow = null; lastKey = lk }
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val head = rBuf.head
          val rk = rKeyF(head)
          if (rk < lk || (rk == lk && rTsF(head) <= lt)) {
            val consumed = rBuf.next()
            if (rk == lk) lastRow = consumed.copy()
            advancing = true
          } else advancing = false
        }
        outProj(joined(lRow, if (lastRow != null) lastRow else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

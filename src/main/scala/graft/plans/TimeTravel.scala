package graft.plans

import org.apache.spark.sql.{GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.TimestampType

import graft.sources.{ManifestTable, Versioned}

/** SQL time travel over [[Versioned]] tables — the syntax the reference's
  * Iceberg tables document (`/root/reference/README.md:332-340`):
  *
  * {{{
  *   SELECT * FROM t VERSION AS OF 3
  *   SELECT * FROM t TIMESTAMP AS OF '2026-01-01 00:00:00'
  * }}}
  *
  * Spark's parser already produces [[RelationTimeTravel]] for both forms,
  * but its analyzer rejects the node for any non-v2 relation — and does so
  * eagerly inside ResolveRelations, before injected resolution rules run.
  * So the swap happens at parse level instead: [[GraftSqlParser.lower]]
  * calls [[TimeTravel.rewrite]] on every parsed plan, replacing the node
  * for tables registered via [[MergeInto.registerVersioned]] with the
  * pinned snapshot's scan — plain parquet of `v=N`, so column pruning and
  * filter pushdown apply to time-travel reads exactly as to live reads.
  * TIMESTAMP AS OF resolves to the latest snapshot committed at or before
  * the instant ([[Versioned.versionAsOf]]), Iceberg's snapshot-log rule.
  * Unregistered names fall through untouched (and get Spark's own v2
  * error), so the rewrite is invisible outside graft tables.
  */
object TimeTravel {

  def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, ver) =>
      (MergeInto.backingFor(u.multipartIdentifier.mkString(".")),
        SparkSession.getActiveSession) match {
        case (Some(MergeInto.VersionedBacking(root)), Some(spark)) =>
          val v = ver.map(_.toLong).getOrElse(
            Versioned.versionAsOf(root, evalMillis(requireTs(ts))))
          GraftColumnBridge.analyzed(Versioned.readVersion(spark, root, v))
        case (Some(MergeInto.ManifestBacking(root, _)), Some(spark)) =>
          val v = ver.map(_.toLong).getOrElse(
            ManifestTable.versionAsOf(root, evalMillis(requireTs(ts))))
          GraftColumnBridge.analyzed(ManifestTable.readVersion(spark, root, v))
        case _ => tt
      }
  }

  private def requireTs(ts: Option[Expression]): Expression =
    ts.getOrElse(throw new IllegalArgumentException(
      "time travel needs VERSION AS OF or TIMESTAMP AS OF"))

  /** Evaluate a (foldable) TIMESTAMP AS OF expression to epoch millis. */
  private def evalMillis(e: Expression): Long = {
    require(e.foldable, s"TIMESTAMP AS OF must be a constant expression, got $e")
    val micros = Cast(e, TimestampType, Some("UTC")).eval(null)
    require(micros != null, s"TIMESTAMP AS OF evaluated to NULL: $e")
    Math.floorDiv(micros.asInstanceOf[Long], 1000L)
  }
}

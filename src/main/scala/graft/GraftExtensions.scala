package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.Native

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions so `spark.sql("SELECT rolling_hash(text)")`
  * works alongside the Column API.
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`; for an existing session,
  * `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.rollingHash)
    e.injectFunction(GraftExtensions.floatCosine)
    // `spark.sql("MERGE INTO …")` for non-v2 tables, plus `VERSION AS OF`
    // / `TIMESTAMP AS OF` over registered Versioned tables (plans.MergeInto,
    // plans.TimeTravel — both rewrites live in GraftSqlParser.lower)
    e.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
  }
}

object GraftExtensions {
  private type FnDesc =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private val rollingHash: FnDesc = (
    FunctionIdentifier("rolling_hash"),
    new ExpressionInfo(classOf[Native.RollingHash].getName, "rolling_hash"),
    (children: Seq[Expression]) => Native.RollingHash(children.head))

  private val floatCosine: FnDesc = (
    FunctionIdentifier("float_cosine"),
    new ExpressionInfo(classOf[Native.FloatCosine].getName, "float_cosine"),
    (children: Seq[Expression]) => Native.FloatCosine(children(0), children(1)))

  /** Register on an already-built session (temp functions). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => Native.RollingHash(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_cosine", exprs => Native.FloatCosine(exprs(0), exprs(1)), "built-in")
  }
}

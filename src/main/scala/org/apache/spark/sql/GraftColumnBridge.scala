package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the classic Column↔Expression converters, which are
  * private[sql] in Spark 4's unified Column API. Lives in the spark.sql
  * package solely to re-export them for graft's native expressions. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Analyzed logical plan of a classic DataFrame. */
  def analyzed(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Wrap a (resolved) logical plan back into a DataFrame. */
  def ofRows(spark: SparkSession,
             plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Re-export of Spark's own catalyst→v1-Filter translation
    * (`protected[sql]` in `DataSourceStrategy`) — what graft's DML
    * manifest pruning uses so predicate semantics (null handling, type
    * coercion, pushability) can never diverge from Spark's. */
  def translateFilter(predicate: Expression): Option[sources.Filter] =
    execution.datasources.DataSourceStrategy
      .translateFilter(predicate, supportNestedPredicatePushdown = false)
}

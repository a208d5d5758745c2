package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge: Spark 4 hides `Dataset.ofRows` and
  * `Column.expr` from user code; a library adding a custom logical
  * operator needs exactly these two hooks (same technique as other
  * Spark-extension libraries). Nothing else from the internal API is
  * touched. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Expression → Column, session-independently: call_function resolves
    * by NAME at analysis time against the DataFrame's own session, so a
    * Column built from it fails on a session never prepped by
    * Catalog.ensure/GraftExtensions (ADVICE r12 #1). Wrapping the
    * expression directly removes the registry from the path entirely. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def plan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].logicalPlan
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression ⇄ LogicalPlan bridge for the graft engine's native
  * Catalyst pieces. `ExpressionUtils`/`Dataset.ofRows` are `private[sql]`
  * in Spark 4.x, so this lives in the `org.apache.spark.sql` namespace —
  * the standard pattern for Spark extension libraries wrapping custom
  * expressions/plans as user-facing Columns/DataFrames.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  def logicalPlan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}

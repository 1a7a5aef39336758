package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for the graft engine's native Catalyst
  * expressions. `ExpressionUtils` is `private[sql]` in Spark 4.x, so this
  * lives in the `org.apache.spark.sql` namespace — the standard pattern for
  * Spark extension libraries needing to wrap custom expressions as
  * user-facing Columns.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

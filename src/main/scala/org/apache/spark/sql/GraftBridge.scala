package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge for the `private[sql]` Column<->Expression converters —
  * the supported way for libraries to surface custom Catalyst expressions
  * as user-facing Columns on classic (non-Connect) Spark.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters. Spark 4
  * routes Column construction through ColumnNodes; this is the classic
  * (non-Connect) conversion path, exposed for graft's native expressions.
  * The same pattern every Catalyst-extension library uses.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

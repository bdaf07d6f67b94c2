package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ⇄ Expression conversions for the
  * graft engine's native expressions — the conventional pattern for Spark
  * extension libraries (Spark 4 routes Column through ColumnNode, so the
  * pre-4.x `new Column(expr)` constructor no longer exists publicly).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

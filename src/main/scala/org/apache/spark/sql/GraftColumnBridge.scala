package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed the public Column(Expression) constructor / Column.expr;
  * the classic bridge (org.apache.spark.sql.classic.ExpressionUtils) is
  * private[sql]. This shim re-exports the two conversions for graft's
  * custom Catalyst expressions. No Spark behavior is modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

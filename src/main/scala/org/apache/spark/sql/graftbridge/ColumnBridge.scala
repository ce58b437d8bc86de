package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed `Column.expr`; the classic bridge (ExpressionUtils) is
  * private[sql], so this one-file shim inside the sql package namespace is the
  * supported-in-practice way for extension libraries to lift custom Catalyst
  * Expressions into the public Column API. No Spark internals are modified. */
object ColumnBridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}

package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed `Column.expr`; the classic bridge (ExpressionUtils) is
  * private[sql], so this one-file shim inside the sql package namespace is the
  * supported-in-practice way for extension libraries to lift custom Catalyst
  * Expressions into the public Column API. No Spark internals are modified. */
object ColumnBridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** Build a DataFrame from a custom LogicalPlan (classic Dataset.ofRows is
    * private[sql]) and read a frame's analyzed plan back out. */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  def logicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> Expression bridge for Spark 4.x, where `Column.expr` and the
 * `Column(Expression)` constructor moved behind `private[sql]`
 * (connect-compatible Column API). Placing this one-file shim inside the
 * `org.apache.spark.sql` package is the established pattern for Spark
 * extension libraries that register custom Catalyst expressions.
 */
object GraftShims {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}

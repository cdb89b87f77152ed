package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` surface needed to lift a custom Catalyst
  * Expression into a public `Column` (standard extension-point technique —
  * the alternatives are registering a FunctionBuilder per session or string
  * SQL, both heavier for a library-internal expression). */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into spark.sql's private[sql] Column<->Expression converters so
  * library code can wrap native Catalyst expressions as Columns (the
  * public API intentionally hides this; extensions conventionally reach
  * it from within the package). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge for graft's native expressions.
  *
  * Spark 4 made `ExpressionUtils` (the only conversion between the
  * public `Column` and catalyst `Expression`) `private[sql]`; extension
  * libraries conventionally reach it from inside the package. Only the
  * two conversions are exposed — no other internals.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

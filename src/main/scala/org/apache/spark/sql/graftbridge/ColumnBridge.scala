package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the Column ↔ Expression converters, which are
  * private[sql] since the Spark 4 Column refactor. Lives under
  * org.apache.spark.sql.* solely for visibility; keep all engine code
  * in graft.*.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

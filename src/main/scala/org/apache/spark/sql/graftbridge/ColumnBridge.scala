package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the classic Column <-> Expression converters, which are
  * `private[sql]` in Spark 4 (the Column API became connect-agnostic).
  * Lives under org.apache.spark.sql so the access modifier admits it —
  * standard practice for libraries shipping custom Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 unified `Column` over ColumnNode and
  * made the classic converters `private[sql]`; this lives under
  * org.apache.spark.sql to reach them (the standard extension-library
  * pattern, cf. SNIPPETS.md [2][3]).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

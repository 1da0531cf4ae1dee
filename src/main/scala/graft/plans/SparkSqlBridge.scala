package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column<->Expression conversions (Spark 4
  * moved Column onto ColumnNode; `classic.ExpressionUtils` is the
  * supported internal shim). Lives under org.apache.spark.sql.* solely
  * for access; keep it minimal.
  */
object SqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

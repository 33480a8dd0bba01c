package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column↔Expression converters
  * (Spark 4 moved Column onto ColumnNode; the classic converters live
  * behind `private[sql]`). This is the supported extension seam for
  * engines that define native Catalyst expressions — nothing else from
  * the private surface is touched.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column <-> Expression converters, for
 * registering custom Catalyst expressions (graft.functions.*) from
 * library code. */
object ColumnBridge {
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
}

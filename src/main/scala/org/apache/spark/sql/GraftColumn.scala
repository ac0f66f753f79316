package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge from a raw Catalyst [[Expression]] to a public [[Column]].
  * Spark 4 routes Column construction through ColumnNode; the converter
  * lives behind `private[sql]`, so this one-liner sits in the sql package.
  */
object GraftColumn {
  def apply(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

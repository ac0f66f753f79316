package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge from a raw Catalyst [[Expression]] to a public [[Column]].
  * Spark 4 routes Column construction through ColumnNode; the converter
  * lives behind `private[sql]`, so this one-liner sits in the sql package.
  */
object GraftColumn {
  def apply(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Column → Expression via the EAGER ColumnNode converter.
    * `ExpressionUtils.expression` merely wraps non-expression nodes in a
    * lazy `ColumnNodeExpression`, which analysis never unwraps when the
    * result is embedded from a FunctionRegistry builder (it surfaces as an
    * unresolvable `columnnodeexpression()` of type VOID). The converter
    * object resolves the node tree to real catalyst expressions up front.
    */
  def expr(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}

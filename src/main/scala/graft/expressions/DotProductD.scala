package graft.expressions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Double-precision dot product of two null-free `array<float>` columns:
  * Σ (double)a[i] · (double)b[i], accumulated left-to-right.
  *
  * Bit-identical to the HOF formulation in `Det.dotD`
  * (`aggregate(zip_with(a,b,(x,y)=>x.cast(double)*y.cast(double)), 0.0, +)`)
  * — same casts, same multiplication, same accumulation order — so results
  * hash-match the DuckDB oracle exactly like the HOF version. What changes
  * is the cost: the HOF path materializes an intermediate array and walks
  * lambda-bound variables per element; this is a fused loop inside
  * WholeStageCodegen. Used by the pairwise-heavy paths (q82/q87, Ann).
  *
  * Length contract: iterates min(|a|,|b|) elements (the zip_with-with-
  * nulls question never arises on fixed-dim embedding columns).
  */
case class DotProductD(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> inputs, " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_d"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var acc = 0.0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}

object DotProductD {
  def dot(a: Column, b: Column): Column =
    GraftColumn(DotProductD(GraftColumn.expr(a), GraftColumn.expr(b)))
}

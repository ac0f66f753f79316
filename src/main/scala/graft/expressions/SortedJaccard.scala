package graft.expressions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Jaccard similarity |A∩B| / |A∪B| for two ASCENDING-SORTED, null-free
  * `array<bigint>` columns, in ONE merge pass.
  *
  * Why this exists (round 12, guide §1.2 "per-task work"): the previous
  * composition `sis / (|A| + |B| - sis)` with `sis =
  * [[SortedIntersectSize]]` evaluates the merge TWICE per row — the
  * Catalyst tree contains two `sorted_intersect_size` nodes and neither
  * join-condition evaluation nor the non-codegen eval path subexpression-
  * eliminates them (measured in the q81/q85/q94 physical plans: the
  * verify join condition ran the merge twice per candidate pair, and the
  * output projection twice more per survivor). This expression computes
  * the identical double in one pass.
  *
  * Bit-equivalence to the old composition (hash-gate critical): with
  * c = |A∩B|, na = |A|, nb = |B| all ints, the old tree evaluated
  * `((double) c) / (((double) na + (double) nb) - (double) c)`. Ints
  * ≤ 2³¹ are exact in double, and this expression performs the same
  * three IEEE ops in the same order — including the 0/0 ⇒ NaN case for
  * two empty arrays — so every produced double is bit-identical.
  *
  * Precondition: same as [[SortedIntersectSize]] — inputs sorted
  * ascending, no null elements (the [[graft.functions.Dedup.tokenIds]] /
  * `gramIds` construction). Keep construction behind
  * [[graft.functions.Dedup.jaccardSortedIds]].
  */
case class SortedJaccard(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c.toDouble / ((nx.toDouble + ny.toDouble) - c.toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |while ($i < $nx && $j < $ny) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = ((double) $c) / (((double) $nx + (double) $ny) - (double) $c);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)
}

object SortedJaccard {
  /** Column API: Jaccard of two sorted null-free long arrays. */
  def jaccard(a: Column, b: Column): Column =
    GraftColumn(SortedJaccard(GraftColumn.expr(a), GraftColumn.expr(b)))
}

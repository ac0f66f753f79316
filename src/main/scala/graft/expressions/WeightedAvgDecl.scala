package graft.expressions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `sum(x·w)/sum(w)` as a DECLARATIVE aggregate — the expression-tier
  * twin of the typed `Aggregator` in UdxQueries.q71 (SURVEY §7.3's
  * extension ladder, completing the third rung: scalar Expression →
  * typed Aggregator → DeclarativeAggregate).
  *
  * Why it exists: a typed `Aggregator` round-trips every row through the
  * object encoder (serialization in the update loop); a
  * DeclarativeAggregate is pure expressions over the unsafe aggregation
  * buffer, so update/merge stay inside whole-stage codegen like the
  * built-in `sum`/`avg` — with identical two-phase (partial + final)
  * planning. Null inputs are skipped (SQL aggregate convention); an empty
  * or all-null group yields NaN, matching the Aggregator's finish().
  */
case class WeightedAvgDecl(x: Expression, w: Expression)
  extends DeclarativeAggregate with ImplicitCastInputTypes {

  private lazy val sumWx = AttributeReference("sum_wx", DoubleType,
    nullable = false)()
  private lazy val sumW = AttributeReference("sum_w", DoubleType,
    nullable = false)()

  override def children: Seq[Expression] = Seq(x, w)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "weighted_avg"

  // numeric inputs coerce to double automatically, like the built-in
  // sum/avg this aggregate twins (round 4 — previously int/decimal Columns
  // failed analysis instead of casting). Declared as Seq[DataType] — the
  // covariant refinement of Seq[AbstractDataType], whose name is
  // private[sql] in Spark 4.
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(sumWx, sumW)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0))
  override lazy val updateExpressions: Seq[Expression] = {
    val bothSet = And(IsNotNull(x), IsNotNull(w))
    Seq(
      If(bothSet, Add(sumWx, Multiply(x, w)), sumWx),
      If(bothSet, Add(sumW, w), sumW))
  }
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Add(sumWx.left, sumWx.right),
    Add(sumW.left, sumW.right))
  override lazy val evaluateExpression: Expression =
    If(EqualTo(sumW, Literal(0.0)), Literal(Double.NaN), Divide(sumWx, sumW))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WeightedAvgDecl =
    copy(x = newChildren(0), w = newChildren(1))
}

object WeightedAvgDecl {
  /** Column API: weighted average aggregate, codegen'd end to end. */
  def weightedAvg(x: Column, w: Column): Column =
    GraftColumn(WeightedAvgDecl(GraftColumn.expr(x), GraftColumn.expr(w))
      .toAggregateExpression())
}

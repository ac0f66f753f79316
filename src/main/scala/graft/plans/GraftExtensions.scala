package graft.plans

import graft.expressions.SortedIntersectSize
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's custom expressions as SQL
  * functions, so `spark.sql("... sorted_intersect_size(a, b) ...")` works
  * alongside the Column API.
  *
  * Two entry points:
  *  - cluster-wide: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *    (the standard `SparkSessionExtensions` injection path);
  *  - per-session: `GraftExtensions.register(spark)` on a live session.
  *
  * No custom optimizer `Rule` or `SparkStrategy` is injected — SURVEY §7.3:
  * Catalyst's built-ins cover every declared query; the only custom piece
  * that earns its keep is the expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.sortedIntersectSizeDesc)
}

object GraftExtensions {

  private val sortedIntersectSizeDesc: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("sorted_intersect_size"),
    new ExpressionInfo(classOf[SortedIntersectSize].getName,
      "sorted_intersect_size"),
    (args: Seq[Expression]) => {
      require(args.length == 2,
        s"sorted_intersect_size takes 2 arguments, got ${args.length}")
      SortedIntersectSize(args.head, args(1))
    })

  /** Register the functions into an already-running session. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = sortedIntersectSizeDesc
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}

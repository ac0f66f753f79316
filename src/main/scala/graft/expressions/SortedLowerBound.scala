package graft.expressions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `count(cuts <= t)` for an ASCENDING-SORTED literal string array `cuts`
  * — the bucket-id primitive behind `Dedup.prefixBuckets` (q115): with
  * contiguous range buckets cut at literal points, the bucket of a text
  * is the number of cut points at or below it.
  *
  * Why a custom Expression (SURVEY §7.3's perf-justified case): the
  * straightforward form is a fold of `when(t >= cut, 1)` — O(|cuts|)
  * string comparisons per row AND a CaseWhen chain whose generated code
  * grows linearly with the bucket count (a cluster-scale bucket knob in
  * the hundreds puts the chain past codegen method limits, falling back
  * to interpreted evaluation on the corpus scan). This is one binary
  * search per row — O(log |cuts|) comparisons — against a shared
  * reference array, inside WholeStageCodegen at any bucket count.
  *
  * Precondition: `cuts` sorted ascending and duplicate-free UNDER
  * `UTF8String.compareTo` (byte/code-point order — the order this
  * expression and Spark's string sort both use; JVM `String` sorting is
  * UTF-16 code-unit order, which DIVERGES once supplementary-plane
  * characters meet U+E000–U+FFFF, so callers must sort with the UTF8
  * comparator, not `.sorted`). Null input → null (unary null-intolerant
  * default).
  *
  * `cuts` is an `IndexedSeq`, not an `Array`: case-class equality on an
  * array field is reference identity, which breaks
  * `semanticEquals`/canonicalization (two identical bucket-assign
  * expressions would never dedup under common-subexpression elimination
  * or exchange reuse). The codegen path materializes the backing array
  * once per compiled plan.
  */
case class SortedLowerBound(child: Expression, cuts: IndexedSeq[UTF8String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_lower_bound"

  override def nullSafeEval(input: Any): Any =
    SortedLowerBound.countLeq(cuts, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val arr = ctx.addReferenceObj("cuts", cuts.toArray,
        "org.apache.spark.unsafe.types.UTF8String[]")
      val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0, $hi = $arr.length;
         |while ($lo < $hi) {
         |  final int $mid = ($lo + $hi) >>> 1;
         |  if ($arr[$mid].compareTo($t) <= 0) { $lo = $mid + 1; }
         |  else { $hi = $mid; }
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SortedLowerBound = copy(child = newChild)
}

object SortedLowerBound {
  /** The shared eval: first index whose cut exceeds `t` == count of cuts
    * at or below `t` (classic upper-bound binary search).
    */
  def countLeq(cuts: IndexedSeq[UTF8String], t: UTF8String): Int = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid).compareTo(t) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Column API: count of `cuts` at or below `t`. `cuts` must be sorted
    * ascending under [[utf8Ordering]] (NOT `String.compareTo` — see the
    * class doc) and duplicate-free.
    */
  def bucketOf(t: Column, cuts: Array[String]): Column =
    GraftColumn(SortedLowerBound(GraftColumn.expr(t),
      cuts.map(UTF8String.fromString).toIndexedSeq))

  /** `String` ordering that agrees with `UTF8String.compareTo` (UTF-8
    * byte order == code-point order) — the order Spark sorts strings in.
    * JVM `String.compareTo` is UTF-16 code-unit order: surrogate pairs
    * (U+10000 and up) compare BELOW U+E000–U+FFFF there, so `.sorted`
    * cut points can violate this expression's sortedness precondition
    * the moment emoji meet private-use/BMP-tail characters.
    */
  val utf8Ordering: Ordering[String] = new Ordering[String] {
    override def compare(a: String, b: String): Int =
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
  }
}

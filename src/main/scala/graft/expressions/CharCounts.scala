package graft.expressions

import java.util.LinkedHashMap

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character histogram in one codegen'd pass:
  * `array<struct<ch: string, c: long>>` in first-occurrence order.
  *
  * Semantics pinned to the explode form it replaces (q112):
  * `explode(split(text, "")) → groupBy(ch) → count` — i.e. one entry per
  * distinct code point, and the EMPTY string yields a single ("", 1)
  * entry (Spark's `split("", "")` emits one empty token; DuckDB's
  * `string_split('', '')` agrees — measured before pinning).
  *
  * Why: the explode form materializes one row PER CHARACTER (~250× the
  * doc count) through the aggregate hash path before the per-(doc, ch)
  * partial collapses it. The histogram is a per-row map-side computation
  * — the downstream per-doc entropy needs no join and no shuffle at all
  * beyond the output sort. Alphabet-bounded memory (distinct code points
  * per doc), like the q112 state bound already argued in SURVEY §2.2.K.
  */
case class CharCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }

  override def dataType: DataType = CharCounts.OutType
  override def prettyName: String = "char_counts"

  override def nullSafeEval(t: Any): Any =
    CharCounts.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CharCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharCounts =
    copy(child = newChild)
}

object CharCounts {

  val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("ch", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  /** Column API. */
  def charCounts(text: Column): Column =
    GraftColumn(CharCounts(GraftColumn.expr(text)))

  /** Single-pass compute; called from both eval and generated code. */
  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    val m = new LinkedHashMap[String, Array[Long]]()
    if (s.isEmpty) {
      m.put("", Array(1L))
    } else {
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        val n = Character.charCount(cp)
        val ch = s.substring(i, i + n)
        val cnt = m.get(ch)
        if (cnt == null) m.put(ch, Array(1L)) else cnt(0) += 1L
        i += n
      }
    }
    val out = new Array[AnyRef](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue()(0)))
        .asInstanceOf[InternalRow]
      j += 1
    }
    new GenericArrayData(out)
  }
}

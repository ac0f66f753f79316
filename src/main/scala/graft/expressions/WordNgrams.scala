package graft.expressions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-grams of a whitespace-tokenized text column in one codegen'd
  * pass. Semantics identical to the Column formulation
  * `transform(sequence(0, size(tok)-n), i -> concat_ws(" ", slice(tok,
  * i+1, n)))` (+ optional `array_distinct`, first-occurrence order), with
  * the [[graft.functions.Dedup.ngrams]] convention that docs shorter than
  * n tokens yield an EMPTY array.
  *
  * Key simplification: tokens are split on every single 0x20 and grams
  * are rejoined with single spaces, so a gram is the VERBATIM byte span
  * of the text from token i's start to token i+n−1's end — empty tokens
  * from runs of spaces reproduce exactly. Each gram is therefore a
  * substring copy; no per-element lambda interpretation, no token array,
  * no concat tree (the Column form is CodegenFallback per element).
  */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean,
                      stride: Int = 1)
  extends UnaryExpression {

  require(n >= 1, s"n=$n must be >= 1")
  require(stride >= 1, s"stride=$stride must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(t: Any): Any =
    WordNgrams.compute(t.asInstanceOf[UTF8String], n, distinct, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.WordNgrams.compute($c, $n, $distinct, $stride)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {

  /** Column API: distinct word n-grams (first-occurrence order). */
  def wordNgrams(text: Column, n: Int): Column =
    GraftColumn(WordNgrams(GraftColumn.expr(text), n, distinct = true))

  /** Column API: all word n-grams in positional order (keeps duplicates —
    * repetition-quality signals need the full multiset). */
  def wordNgramsAll(text: Column, n: Int): Column =
    GraftColumn(WordNgrams(GraftColumn.expr(text), n, distinct = false))

  /** Column API: NON-OVERLAPPING full n-token chunks in positional order
    * (stride = n) — the "line" unit of sub-document dedup (q106). */
  def wordChunks(text: Column, n: Int): Column =
    GraftColumn(WordNgrams(GraftColumn.expr(text), n, distinct = false,
      stride = n))

  /** Single-pass compute; called from both eval and generated code. */
  def compute(text: UTF8String, n: Int, distinct: Boolean,
              stride: Int = 1): ArrayData = {
    val bytes = text.getBytes
    // token start offsets (a token starts at 0 and after every space;
    // multi-byte UTF8 never contains 0x20)
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' '.toByte) nTok += 1; i += 1 }
    if (nTok < n) return new GenericArrayData(Array.empty[AnyRef])
    val starts = new Array[Int](nTok + 1)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTok) = bytes.length + 1 // sentinel: token k ends at starts(k+1)-1
    val m = (nTok - n) / stride + 1
    val out = new Array[AnyRef](m)
    val seen = if (distinct) new java.util.HashSet[UTF8String](m * 2) else null
    var k = 0
    var w = 0
    while (k < m) {
      val from = starts(k * stride)
      val until = starts(k * stride + n) - 1
      val gram = UTF8String.fromBytes(bytes, from, until - from)
      if (!distinct || seen.add(gram)) { out(w) = gram; w += 1 }
      k += 1
    }
    new GenericArrayData(if (w == m) out else java.util.Arrays.copyOf(out, w))
  }
}

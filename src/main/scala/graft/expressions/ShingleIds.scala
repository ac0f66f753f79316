package graft.expressions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted, distinct 64-bit ids of the word-`n`-grams of a text column, in
  * ONE codegen'd pass: byte-scan tokenize on 0x20, hash each token
  * (FNV-1a + splitmix64 finalizer), chain `n` consecutive token hashes
  * into a gram id, then sort + dedup into a primitive long array.
  *
  * Why a custom Expression (SURVEY §7.3, same justification tier as
  * [[SortedIntersectSize]]): the built-in formulation
  * `array_sort(array_distinct(transform(split/ngrams, xxhash64)))` stacks
  * 3-4 higher-order functions, all CodegenFallback — per element Spark
  * walks an interpreted expression tree with boxing. Measured on q86's
  * gram build at sf0.1: 3.3 s HOF chain vs ~0.2 s this expression — and it
  * feeds every near-dup verify loop (q81/q85/q86/q94, CurationPipeline).
  *
  * Semantics contract (what the DuckDB oracles actually rely on): the
  * VALUES are internal — only SET SIZES must match the string-set
  * definitions (`list_distinct(string_split(text,' '))` for n=1; distinct
  * space-joined grams, empty when tokens < n, for n≥2), which holds unless
  * two distinct token tuples collide in 64 bits (~m²/2⁶⁵; DedupSpec pins
  * collision-freedom on the fixtures). Tokens never contain the separator,
  * so tuple identity ⇔ joined-string identity, and empty tokens from
  * repeated spaces hash like the string semantics keeps them.
  *
  * Interop: output is ascending-sorted, null-free `array<bigint>` — the
  * exact precondition of [[SortedIntersectSize]].
  */
case class ShingleIds(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_ids"

  override def nullSafeEval(t: Any): Any =
    ShingleIds.compute(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.ShingleIds.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleIds =
    copy(child = newChild)
}

object ShingleIds {

  /** Column API: sorted distinct ids of word-n-grams (n=1 ⇒ token ids). */
  def shingleIds(text: Column, n: Int): Column =
    GraftColumn(ShingleIds(GraftColumn.expr(text), n))

  private final val FnvBasis = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L
  private final val GramSeed = 0x9E3779B97F4A7C15L

  /** splitmix64 finalizer — full-avalanche mix of a 64-bit value. */
  @inline private def mix(z0: Long): Long = {
    var z = z0
    z ^= z >>> 30; z *= 0xbf58476d1ce4e5b9L
    z ^= z >>> 27; z *= 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Single-pass compute; called from both eval and generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    // pass 1: token hashes (split on every 0x20, keeping empty tokens —
    // multi-byte UTF8 never contains 0x20, so a raw byte scan is exact)
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' '.toByte) nTok += 1; i += 1 }
    val tokHash = new Array[Long](nTok)
    var t = 0
    var h = FnvBasis
    i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == ' '.toByte) { tokHash(t) = mix(h); t += 1; h = FnvBasis }
      else h = (h ^ (b & 0xffL)) * FnvPrime
      i += 1
    }
    tokHash(t) = mix(h)
    // pass 2: gram ids — order-dependent chain of n consecutive token hashes
    val nGram = nTok - n + 1
    if (nGram <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val gram = new Array[Long](nGram)
    var g = 0
    while (g < nGram) {
      var acc = GramSeed
      var k = 0
      while (k < n) { acc = mix(acc ^ tokHash(g + k)); k += 1 }
      gram(g) = acc
      g += 1
    }
    // sort + in-place dedup
    java.util.Arrays.sort(gram)
    var out = 1
    i = 1
    while (i < nGram) {
      if (gram(i) != gram(i - 1)) { gram(out) = gram(i); out += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (out == nGram) gram else java.util.Arrays.copyOf(gram, out))
  }
}

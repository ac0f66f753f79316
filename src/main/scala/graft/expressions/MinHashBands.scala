package graft.expressions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All LSH band keys of a text column in ONE pass (Broder minhash +
  * banding, semantics identical to [[graft.functions.MinHashLSH]]'s
  * Column formulation): band b's key is
  * `"b|" + minhash(b·r) + "|" + … + minhash(b·r+r−1)` where
  * `minhash(i) = min over tokens of lowercase-hex md5("i|" + token)` and
  * r = k/bands — byte-for-byte the string the q85/q94 DuckDB oracles
  * rebuild, so the band GROUPING (all that matters downstream; keys are
  * xxhash64-compressed before the bucket join) is unchanged.
  *
  * Why an expression (SURVEY §7.3 tier): the Column form runs k
  * interpreted `transform`+`array_min` folds per row (CodegenFallback,
  * per-element lambda interpretation, k concat/md5 Column trees, plus an
  * `array_distinct` pre-pass). This is a single tokenization walk
  * computing all k digests per token with a thread-cached MessageDigest,
  * called from WholeStageCodegen. Duplicate tokens need no dedup pass:
  * the min over duplicates equals the min over distinct values.
  */
case class MinHashBands(child: Expression, k: Int, bands: Int)
  extends UnaryExpression {

  require(k > 0 && bands > 0 && k % bands == 0,
    s"k=$k must be positive and divisible by bands=$bands")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(t: Any): Any =
    MinHashBands.compute(t.asInstanceOf[UTF8String], k, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.MinHashBands.compute($c, $k, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {

  /** Column API: array of `bands` band-key strings for `text`. */
  def bandKeys(text: Column, k: Int, bands: Int): Column =
    GraftColumn(MinHashBands(GraftColumn.expr(text), k, bands))

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** "0|".."15|" seed prefixes, preencoded. */
  private val seedPrefix: Array[Array[Byte]] =
    (0 until 16).map(i => s"$i|".getBytes("UTF-8")).toArray

  private val hexChars = "0123456789abcdef".toCharArray

  /** Single-pass compute; called from both eval and generated code. */
  def compute(text: UTF8String, k: Int, bands: Int): ArrayData = {
    val bytes = text.getBytes
    val md = md5Local.get()
    // per-seed running min digest, compared as unsigned big-endian bytes
    // (== lexicographic order of the lowercase-hex rendering)
    val mins = Array.ofDim[Byte](k, 16)
    val seen = new Array[Boolean](k)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        // token = bytes[start, i) (multi-byte UTF8 never contains 0x20)
        var s = 0
        while (s < k) {
          md.reset()
          md.update(if (s < 16) seedPrefix(s) else s"$s|".getBytes("UTF-8"))
          md.update(bytes, start, i - start)
          val d = md.digest()
          if (!seen(s) || unsignedLess(d, mins(s))) {
            System.arraycopy(d, 0, mins(s), 0, 16)
            seen(s) = true
          }
          s += 1
        }
        start = i + 1
      }
      i += 1
    }
    val r = k / bands
    val out = new Array[AnyRef](bands)
    var b = 0
    while (b < bands) {
      // "b|" + hex(min(b*r)) + "|" + ... — r digests of 32 hex chars
      val prefix = b.toString
      val sb = new java.lang.StringBuilder(prefix.length + r * 33)
      sb.append(prefix)
      var j = 0
      while (j < r) {
        sb.append('|')
        val d = mins(b * r + j)
        var x = 0
        while (x < 16) {
          sb.append(hexChars((d(x) >> 4) & 0xf))
          sb.append(hexChars(d(x) & 0xf))
          x += 1
        }
        j += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }
}

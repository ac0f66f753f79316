package graft.expressions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, "Winnowing: Local
  * Algorithms for Document Fingerprinting", SIGMOD 2003 — public
  * literature; the MOSS sketch) of a whitespace-tokenized text column in
  * one codegen'd pass: hash every word n-gram to 60 bits (first 15 hex
  * chars of `md5(gram)` — the [[SimHash60]] convention, exactly
  * replayable in SQL), slide a window of `w` consecutive gram hashes,
  * select each window's minimum, and return the SORTED DISTINCT selected
  * hashes.
  *
  * Winnowing's guarantee — which bottom-k / min-shingle sketches (q89)
  * lack — is POSITIONAL coverage: any shared substring of at least
  * n+w−1 tokens between two documents yields at least one shared
  * fingerprint. That makes it the sketch for partial-overlap detection
  * (plagiarism/quotation/boilerplate spans) rather than whole-document
  * near-dup. Fingerprint density is ~2/(w+1) of the gram count.
  *
  * Shorter-than-one-window docs (0 < m < w grams) select the global min
  * (one fingerprint — pinned on both engines); docs with fewer than n
  * tokens yield an empty array, the [[WordNgrams]] convention.
  */
case class WinnowIds(child: Expression, n: Int, w: Int)
  extends UnaryExpression {

  require(n >= 1 && w >= 1, s"n=$n and w=$w must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_ids"

  override def nullSafeEval(t: Any): Any =
    WinnowIds.compute(t.asInstanceOf[UTF8String], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.WinnowIds.compute($c, $n, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowIds =
    copy(child = newChild)
}

object WinnowIds {

  /** Column API: sorted distinct winnowing fingerprints. */
  def winnowIds(text: Column, n: Int, w: Int): Column =
    GraftColumn(WinnowIds(GraftColumn.expr(text), n, w))

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5 = value of the first 15 hex chars (the
    * SimHash60 convention). */
  private def md5Head60(md: java.security.MessageDigest,
                        bytes: Array[Byte], from: Int, until: Int): Long = {
    md.reset()
    md.update(bytes, from, until - from)
    val d = md.digest()
    ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) | ((d(2) & 0xffL) << 36) |
      ((d(3) & 0xffL) << 28) | ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
      ((d(6) & 0xffL) << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Single-pass compute; called from both eval and generated code. */
  def compute(text: UTF8String, n: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' '.toByte) nTok += 1; i += 1 }
    if (nTok < n) return new GenericArrayData(Array.empty[Long])
    val starts = new Array[Int](nTok + 1)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTok) = bytes.length + 1
    val m = nTok - n + 1
    val md = md5Local.get()
    val hashes = new Array[Long](m)
    var k = 0
    while (k < m) {
      // gram = verbatim byte span (the WordNgrams argument)
      hashes(k) = md5Head60(md, bytes, starts(k), starts(k + n) - 1)
      k += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    val nWin = math.max(m - w + 1, 1)
    var s = 0
    while (s < nWin) {
      var mn = hashes(s)
      var j = s + 1
      val end = math.min(s + w, m)
      while (j < end) { if (hashes(j) < mn) mn = hashes(j); j += 1 }
      sel.add(mn)
      s += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}

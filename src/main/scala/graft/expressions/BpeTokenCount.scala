package graft.expressions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic subword (BPE-style) token count, codegen'd — the unit
  * real LLM pipelines pack and mix by (whitespace words undercount by
  * 1.3–1.7× and skew per language; packing math needs the model's unit).
  *
  * Semantics (pinned, engine-replayable):
  *   1. words = maximal runs of ASCII `[A-Za-z0-9]`; everything else
  *      (punctuation, whitespace, non-ASCII) separates. Runs are
  *      ASCII-lowercased.
  *   2. each word is segmented greedily left-to-right: at every position
  *      take the LONGEST vocabulary subword matching as a prefix (the
  *      WordPiece/greedy-BPE inference rule); single characters always
  *      match implicitly, so segmentation is total and unique.
  *   3. token count = segments summed over words. Empty/word-free text
  *      counts 0.
  *
  * The vocabulary is a FIXED merge list shipped in [[BpeTokenCount.merges]]
  * — no training step, no file I/O, same list interpolated into the DuckDB
  * oracle (`oracleVocabValues`), so the count is a pure deterministic
  * function of the string on both engines. Greedy longest-prefix over a
  * fixed vocab is the standard deterministic tokenizer-inference shape;
  * swapping in a real model's merge table changes the list, not the
  * operator.
  *
  * Scale: one codegen'd pass per row (no split/explode materialization,
  * no per-row regex), O(len · maxMergeLen) worst case with zero
  * allocation beyond the lowercase buffer.
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(t: Any): Any =
    BpeTokenCount.count(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.BpeTokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {

  /** Column API. */
  def bpeTokenCount(text: Column): Column =
    GraftColumn(BpeTokenCount(GraftColumn.expr(text)))

  /** The fixed multi-character subword vocabulary (single ASCII
    * alphanumerics are implicit). Frequency-ordered English merges —
    * bigrams, trigrams, and affixes a byte-level BPE learns first on
    * English text. Lowercase by construction (input words are lowercased
    * before matching).
    */
  val merges: Seq[String] = Seq(
    // top English bigrams
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd", "ti",
    "es", "or", "te", "of", "ed", "is", "it", "al", "ar", "st", "to",
    "nt", "ng", "se", "ha", "as", "ou", "io", "le", "ve", "co", "me",
    "de", "hi", "ri", "ro", "ic", "ne", "ea", "ra", "ce", "li", "ch",
    "ll", "be", "ma", "si", "om", "ur", "ca", "el", "ta", "la", "ns",
    "di", "fo", "ho", "pe", "ec", "pr", "no", "ct", "us", "ac", "ot",
    "il", "tr", "ly", "nc", "et", "ut", "ss", "so", "rs", "un", "lo",
    "wa", "ge", "ie", "wh", "ee", "wi", "em", "ad", "ol", "rt", "po",
    // top trigrams + common affixes
    "the", "ing", "and", "ion", "ent", "for", "ati", "ter", "ate",
    "ers", "res", "con", "ver", "all", "ons", "est", "ble", "ith",
    "ive", "pro", "com", "per", "men", "ere", "his", "ous", "pre",
    "ted", "ist", "ant", "int", "her", "ies", "out", "sub", "han",
    // high-frequency 4-6 char units
    "tion", "ment", "ther", "with", "that", "ight", "ound", "ough",
    "ness", "able", "ance", "ence", "less", "ation", "ative", "ition")

  private val maxLen: Int = merges.map(_.length).max
  // lookup sets bucketed by length: greedy tries the longest first
  private val byLen: Array[java.util.HashSet[String]] = {
    val a = Array.fill(maxLen + 1)(new java.util.HashSet[String]())
    merges.foreach(m => a(m.length).add(m))
    a
  }

  /** `(VALUES ('th'),('he'),…)` body for the DuckDB oracle's vocab CTE —
    * the SAME list, single source of truth.
    */
  def oracleVocabValues: String = merges.map(m => s"('$m')").mkString(",")

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  private def lower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** Single-pass count; called from both eval and generated code. */
  def count(text: UTF8String): Long = {
    val s = text.toString
    val n = s.length
    var tokens = 0L
    var i = 0
    while (i < n) {
      if (!isWordChar(s.charAt(i))) { i += 1 }
      else {
        // word run [i, j)
        var j = i
        while (j < n && isWordChar(s.charAt(j))) j += 1
        val w = new Array[Char](j - i)
        var k = 0
        while (k < w.length) { w(k) = lower(s.charAt(i + k)); k += 1 }
        // greedy longest-prefix segmentation
        var p = 0
        while (p < w.length) {
          var step = 1
          var l = math.min(maxLen, w.length - p)
          while (l >= 2 && step == 1) {
            if (byLen(l).contains(new String(w, p, l))) step = l
            l -= 1
          }
          p += step
          tokens += 1L
        }
        i = j
      }
    }
    tokens
  }
}

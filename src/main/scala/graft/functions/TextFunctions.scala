package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token counting,
  * quality scoring, language ID, document fingerprinting, full-text search
  * (the SoQL `$q` analog — SURVEY §2.3).
  *
  * All pure column expressions (codegen'd, narrow) except language ID,
  * which needs a per-language vocabulary profile — built in one
  * aggregation pass and broadcast back.
  */
object TextFunctions {

  /** whitespace token count */
  def tokenCountWs(text: Column): Column = size(split(text, " "))

  /** BPE-ish token count: alpha runs, digit runs, and single non-space
    * symbols each count as one token.
    */
  def tokenCountRegex(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Ordered, NON-distinct word n-grams (empty for docs shorter than n
    * tokens — the [[Dedup.ngrams]] convention). Unlike the distinct-set
    * variants used for dedup, this keeps duplicates: repetition-quality
    * signals need the full multiset.
    */
  def wordNgramsAll(text: Column, n: Int): Column =
    graft.expressions.WordNgrams.wordNgramsAll(text, n)

  /** distinct-token ratio: vocabulary richness in [0,1] */
  def distinctRatio(text: Column): Column = {
    val tok = split(text, " ")
    size(array_distinct(tok)).cast("double") / size(tok).cast("double")
  }

  /** mean token length */
  def avgTokenLen(text: Column): Column = {
    val tok = split(text, " ")
    aggregate(tok, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      size(tok).cast("double")
  }

  /** fraction of tokens in `stopwords` */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val tok = split(text, " ")
    size(array_intersect_keepdup(tok, stopwords)).cast("double") /
      size(tok).cast("double")
  }

  // filter(tok, t -> t IN stopwords) — keeps duplicates, unlike array_intersect
  private def array_intersect_keepdup(tok: Column, words: Seq[String]): Column =
    filter(tok, t => t.isInCollection(words))

  /** punctuation-character ratio over the whole text; NULL for the
    * empty string (0/0 is undefined — and an ANSI DIVIDE_BY_ZERO
    * without the guard), which propagates to a NULL qualityScore:
    * an empty doc has no quality, and NULLS-LAST descending order
    * ranks it below every scored doc on both engines. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", "")))
      .cast("double") / nullif(length(text), lit(0)).cast("double")

  /** Composite quality score in [0,1]: rewards mid-length docs, rich
    * vocabulary, low punctuation. Weights are heuristic — the point is the
    * shape (pure narrow projection; scores 100 TB at scan speed).
    *
    * Computed in exact integer basis points (each component quantized to
    * 1e-4, weighted by small ints, summed, then one exact /1e5 division).
    * A float composite of 4-dp components lands exactly on 5th-decimal
    * rounding boundaries by construction, where engines' round() rules
    * disagree — integer arithmetic has no boundary at all.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    def bp(c: Column): Column = round(c * 10000).cast("long")
    val lenBp = bp(least(length(text).cast("double") / 500.0, lit(1.0)))
    val distBp = bp(distinctRatio(text))
    val punctBp = bp(punctRatio(text))
    val stopBp = bp(stopwordRatio(text, stopwords))
    (lenBp * 3 + distBp * 4 + (lit(10000L) - punctBp) * 2 +
      (lit(10000L) - stopBp)).cast("double") / 100000.0
  }

  /** PII redaction patterns, applied in precedence order (most-specific
    * shape first, so an SSN is tagged [SSN] before the phone heuristic can
    * eat it). Heuristic by design — a compliance pass over web-scale
    * training text trades recall for precision and auditability; every
    * replacement leaves a typed tag so downstream filters can count or
    * drop redacted docs.
    */
  private val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "[EMAIL]",
    "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b" -> "[IP]",
    "\\b\\d{3}-\\d{2}-\\d{4}\\b" -> "[SSN]",
    "\\b(?:\\d{4}[ -]){3}\\d{4}\\b|\\b\\d{13,16}\\b" -> "[CARD]",
    // the phone pattern opens with an OPTIONAL country code, so a bare \b
    // can't anchor it ("+1 ..." starts at a non-word char); without a
    // leading guard it would claim a 10-digit SUFFIX inside digit runs
    // too long for [CARD] (>16 digits, e.g. tracking numbers) and mangle
    // them into half-redactions. RE2 (the oracle engine) has no
    // lookbehind, so the guard is a consumed-and-reinserted capture:
    // (non-digit | start) re-emitted via $1 ahead of the tag.
    // ^ FIRST in the alternation: at string start the empty match must
    // win so `\+?` keeps a leading "+1..." inside the redaction
    "(^|[^0-9])((?:\\+?\\d{1,2}[ .-]?)?\\(?\\d{3}\\)?[ .-]?\\d{3}[ .-]?\\d{4}\\b)"
      -> "$1[PHONE]")

  /** Redact emails, IPv4s, SSN-shaped, card-shaped, and phone-shaped
    * substrings to typed tags. Pure chained `regexp_replace` — codegen'd,
    * scan-speed, idempotent (tags contain no redactable shapes).
    * Replacements are raw Java replacement strings (the phone one carries
    * the $1 guard re-insert) — tags themselves contain no `$`/`\`.
    */
  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (re, repl)) =>
      regexp_replace(c, re, repl) }

  /** Number of PII redactions [[scrubPii]] performs on `text` — counted as
    * tags in the scrubbed output, so the count is exactly consistent with
    * the precedence-ordered scrub (a digit run claimed by [SSN] is never
    * also counted as a phone).
    */
  def piiCount(text: Column): Column =
    size(regexp_extract_all(scrubPii(text),
      lit("\\[(EMAIL|IP|SSN|CARD|PHONE)\\]"), lit(0))).cast("long")

  /** Order-sensitive document fingerprint: a Karp–Rabin polynomial rolling
    * hash over per-token xxhash64 values, base 31 modulo the Mersenne prime
    * 2^31−1 (modular form keeps every step inside long range — Spark 4 runs
    * ANSI mode, so wrapping overflow would throw). Identical token
    * sequences ⇒ identical fingerprints; any reorder/edit ⇒ different
    * (w.h.p.). One narrow fold, no shuffle.
    */
  def fingerprint(text: Column): Column = {
    val m = lit((1L << 31) - 1)
    aggregate(split(text, " "), lit(0L),
      (acc, t) => pmod(acc * 31L + pmod(xxhash64(t), m), m))
  }

  /** Full-text search (SoQL `$q` analog): docs whose token set contains
    * EVERY term in `query` (whitespace-split, conjunctive, unranked —
    * matching Socrata's documented `$q` semantics closely enough for the
    * capability tier).
    */
  def fullTextSearch(docs: DataFrame, textCol: String, query: String): DataFrame = {
    val terms = query.trim.split("\\s+").toSeq
    val tok = split(col(textCol), " ")
    terms.foldLeft(docs)((df, t) => df.filter(array_contains(tok, t)))
  }

  /** Ranked full-text search: the conjunctive `$q` match of
    * [[fullTextSearch]], ordered by relevance — the summed TF-IDF of the
    * query terms (`Σ_t tf(t,doc)·ln(N/df(t))`, the same weighting q92
    * computes corpus-wide), with a deterministic `idCol` tie-break.
    *
    * Scale shape: N is a 1-row aggregate, per-term document frequencies are
    * a tiny broadcast (≤ |query| rows), and term frequencies are computed
    * only over the already-matched docs — no corpus-wide per-doc loop, one
    * narrow explode + two small joins.
    */
  def fullTextSearchRanked(docs: DataFrame, idCol: String, textCol: String,
                           query: String): DataFrame = {
    val terms = query.trim.split("\\s+").toSeq.distinct
    val matched = fullTextSearch(docs, textCol, query)
    val nDf = docs.agg(count(lit(1)).cast("double").as("__n"))
    val dfPerTerm = docs
      .select(explode(array_distinct(split(col(textCol), " "))).as("__term"))
      .filter(col("__term").isInCollection(terms))
      .groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    val tf = matched
      .select(col(idCol), explode(split(col(textCol), " ")).as("__term"))
      .filter(col("__term").isInCollection(terms))
      .groupBy(col(idCol), col("__term")).agg(count(lit(1)).as("__tf"))
    val scores = tf
      .join(broadcast(dfPerTerm), "__term")
      .crossJoin(broadcast(nDf))
      .groupBy(col(idCol))
      .agg(sum(col("__tf") * log(col("__n") / col("__df"))).as("score"))
    matched.join(scores, idCol)
      .orderBy(col("score").desc, col(idCol).asc)
  }

  /** BM25-ranked full-text search (Robertson–Spärck Jones probabilistic
    * weighting, the Okapi/Lucene default): the conjunctive match of
    * [[fullTextSearch]] ordered by
    * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with the
    * always-positive idf form `ln(1 + (N−df+0.5)/(df+0.5))`. Unlike the
    * TF-IDF ranking of [[fullTextSearchRanked]], BM25 saturates term
    * frequency (a 100-hit doc doesn't score 100×) and normalizes for
    * document length — the ranking shape retrieval stacks actually ship.
    *
    * Scale shape identical to [[fullTextSearchRanked]]: corpus stats (N,
    * avgdl) are a 1-row aggregate, per-term document frequencies a ≤|query|
    * row broadcast, term frequencies computed only over matched docs.
    */
  def bm25Ranked(docs: DataFrame, idCol: String, textCol: String,
                 query: String, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = query.trim.split("\\s+").toSeq.distinct
    val matched = fullTextSearch(docs, textCol, query)
    val stats = docs.agg(
      count(lit(1)).cast("double").as("__n"),
      avg(size(split(col(textCol), " ")).cast("double")).as("__avgdl"))
    val dfPerTerm = docs
      .select(explode(array_distinct(split(col(textCol), " "))).as("__term"))
      .filter(col("__term").isInCollection(terms))
      .groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    val tf = matched
      .select(col(idCol),
        size(split(col(textCol), " ")).cast("double").as("__dl"),
        explode(split(col(textCol), " ")).as("__term"))
      .filter(col("__term").isInCollection(terms))
      .groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).cast("double").as("__tf"), max(col("__dl")).as("__dl"))
    val scores = tf
      .join(broadcast(dfPerTerm), "__term")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) /
          (col("__df") + lit(0.5))))
      .withColumn("__w",
        col("__idf") * (col("__tf") * lit(k1 + 1.0)) /
          (col("__tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col(idCol)).agg(sum(col("__w")).as("score"))
    matched.join(scores, idCol)
      .orderBy(col("score").desc, col(idCol).asc)
  }

  /** Language ID via n-gram/vocabulary profiles: build a top-`profileSize`
    * term profile per language from a labeled corpus (one agg pass, tiny
    * result, broadcast), then score each doc by profile overlap; predicted
    * language = argmax overlap (ties → lexicographically first lang).
    * Returns the input plus `pred_lang` and `lang_overlap`.
    *
    * @param idCol a stable unique row id for the argmax window; when absent
    *              the id is derived as `xxhash64` over ALL input columns —
    *              deterministic across runs and partitionings (unlike
    *              `monotonically_increasing_id`, which §7.2.7 bans), at the
    *              cost of collapsing fully-identical duplicate rows onto one
    *              output row (identical rows are interchangeable, so the
    *              result is still deterministic).
    */
  def langId(docs: DataFrame, labeled: DataFrame, textCol: String,
             langCol: String, profileSize: Int = 20,
             idCol: Option[String] = None): DataFrame = {
    val wTop = Window.partitionBy(col("lang_p"))
      .orderBy(col("cnt").desc, col("term").asc)
    val profiles = labeled
      .select(col(langCol).as("lang_p"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("lang_p"), col("term")).agg(count(lit(1)).as("cnt"))
      .withColumn("r", row_number().over(wTop))
      .filter(col("r") <= profileSize)
      .groupBy(col("lang_p"))
      .agg(collect_list(col("term")).as("profile"))
    val withId = idCol match {
      case Some(c) => docs.withColumn("__rid", col(c))
      case None => docs.withColumn("__rid", xxhash64(docs.columns.map(col): _*))
    }
    // Compute-dense-projection guard (round 10): the per-(doc, lang)
    // overlap scoring below costs ~100× the scan feeding it, and it runs
    // in the SCAN's stage (it precedes the window exchange). When the
    // corpus fits in fewer splits than cores — the sf1 fixture's
    // documents table is ONE sub-8-MiB row group — the whole scoring
    // stage inherits 1-task parallelism and runs 30× slower than the
    // same work spread over the cores (measured at sf1: 25-50 s vs
    // 3-4 s; the misdiagnosed "session-age" artifact, BASELINE §4.0c).
    // Spread only when the scan is genuinely narrower than half the
    // cores: on any real corpus (scan splits ≫ cores) this branch is the
    // identity and adds NO exchange at scale. Round-robin repartition is
    // output-safe here: every downstream step is keyed (window by __rid,
    // final orderBy), so row placement never reaches the result.
    val spread = Escalation.spreadIfNarrow(withId)
    val wBest = Window.partitionBy(col("__rid"))
      .orderBy(col("lang_overlap").desc, col("lang_p").asc)
    spread
      .crossJoin(broadcast(profiles))
      .withColumn("lang_overlap",
        size(array_intersect(array_distinct(split(col(textCol), " ")),
          col("profile"))))
      .withColumn("__r", row_number().over(wBest))
      .filter(col("__r") === 1)
      .withColumn("pred_lang", col("lang_p"))
      .drop("lang_p", "profile", "__r", "__rid")
  }
}

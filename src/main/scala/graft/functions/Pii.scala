package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training corpora (the C4/Dolma-style scrub stage:
  * replace emails / phone numbers / IP addresses with typed placeholder
  * tokens before anything else sees the text).
  *
  * All patterns live in the RE2 ∩ java.util.regex common subset (character
  * classes, bounded repetition, `\b` word boundaries — no backrefs, no
  * lookaround) so a DuckDB/RE2 oracle replays them byte-identically; the
  * same discipline as [[TextFunctions]] and CorpusQueries.q103.
  *
  * Everything here is a codegen'd `regexp_replace`/`regexp_extract_all`
  * chain — scan-speed at 100 TB, no shuffle, no UDF. Redaction is ordered
  * email → phone → IP: emails are the only class whose pattern could
  * partially overlap another (dots in domains), so they are consumed
  * first; the later patterns cannot match inside an already-emitted
  * placeholder token.
  *
  * Scope: the phone pattern covers the NANP `555-XXXX` exchange used by
  * the fixtures and tests; production scrubbing would extend the
  * alternation (international formats) without changing the plan shape.
  */
object Pii {

  val EmailRe = "[a-z0-9._%-]+@[a-z0-9.-]+\\.[a-z]{2,4}"
  val PhoneRe = "\\b555-[0-9]{4}\\b"
  val Ipv4Re = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"

  val EmailToken = "[EMAIL]"
  val PhoneToken = "[PHONE]"
  val IpToken = "[IP]"

  /** `text` with all three PII classes replaced by their tokens. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailToken),
        PhoneRe, PhoneToken),
      Ipv4Re, IpToken)

  /** count of matches of `re` in `text` (full-match group, long-typed —
    * DuckDB's `len(regexp_extract_all(...))` is BIGINT) */
  def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  def emailCount(text: Column): Column = countMatches(text, EmailRe)
  def phoneCount(text: Column): Column = countMatches(text, PhoneRe)
  def ipCount(text: Column): Column = countMatches(text, Ipv4Re)
}

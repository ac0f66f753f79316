package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Pins the text-tier hazard semantics the round-7 adversarial fixture
  * forced (CORRECTNESS_adversarial_r07.txt): ASCII-only case folding in
  * the q103 normalizer, NULL winnowing digests for window-less docs,
  * and NULL quality for the empty document.
  */
class TextHazardsSpec extends SparkSpec {
  import spark.implicits._

  private def normalize(s: String): String =
    Seq(s).toDF("text")
      .select(trim(regexp_replace(regexp_replace(
        translate(col("text"),
          "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"),
        "[^a-z0-9 ]", " "), " +", " ")).as("n"))
      .head().getString(0)

  test("q103 fold is ASCII-only: locale-table hazards become separators") {
    // Java's FULL case mappings lower U+0130 to i + combining dot and
    // apply contextual final sigma; utf8proc SIMPLE-maps both. The
    // byte-level fold sidesteps the tables entirely: every non-ASCII
    // letter is a separator, identically on any engine.
    assert(normalize("İstanbul") === "stanbul")
    assert(normalize("ΣΊΣΥΦΟΣ") === "")
    assert(normalize("STRASSE groß MiXeD-Case 42") ===
      "strasse gro mixed case 42")
    assert(normalize("Hello, World!") === "hello world")
  }

  test("winnowing digest is NULL when a doc has no fingerprint window") {
    val df = Seq(
      (1L, ""),                                    // empty
      (2L, "one two"),                             // < n tokens
      (3L, "東京都に住"),      // space-free CJK
      (4L, "a b c d e f g h i j"))                 // enough windows
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      graft.expressions.WinnowIds.winnowIds(col("text"), 3, 4).as("fp"))
      .select(col("doc_id"), size(col("fp")).as("n_fp"),
        md5(nullif(concat_ws(",",
          expr("transform(fp, x -> cast(x as string))")), lit("")))
          .as("fp_digest"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.isNullAt(2))).toSeq
    val (withWindows, without) = out.partition(_._1 == 4L)
    assert(without.forall { case (_, n, isNull) => n == 0 && isNull },
      "window-less docs -> 0 fingerprints, NULL digest")
    assert(withWindows.forall { case (_, n, isNull) => n > 0 && !isNull })
  }

  test("quality score of the empty document is NULL, not a crash") {
    val stops = Seq("join", "filter", "scan")
    val out = Seq(("", 0), ("the quick brown fox", 1)).toDF("text", "id")
      .select(col("id"),
        TextFunctions.qualityScore(col("text"), stops).as("q"))
      .collect().map(r => r.getInt(0) -> r.isNullAt(1)).toMap
    assert(out(0), "empty doc has no quality (ANSI-safe NULL)")
    assert(!out(1))
  }

  test("NULL quality sorts below every scored doc in descending order") {
    val stops = Seq("join", "filter", "scan")
    val ranked = Seq(("", 0), ("some normal document text here", 1),
      ("another scored doc", 2)).toDF("text", "id")
      .select(col("id"),
        TextFunctions.qualityScore(col("text"), stops).as("q"))
      .orderBy(col("q").desc, col("id"))
      .collect().map(_.getInt(0)).toSeq
    assert(ranked.last === 0, "the empty doc ranks last (NULLS LAST)")
  }
}

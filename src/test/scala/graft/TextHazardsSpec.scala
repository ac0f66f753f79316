package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Pins the text-tier hazard semantics the round-7 adversarial fixture
  * forced (CORRECTNESS_adversarial_r07.txt) — driving the REAL declared
  * queries (via SparkEntry.queries) over a temp parquet fixture, so a
  * regression in the operators themselves turns these red.
  */
class TextHazardsSpec extends SparkSpec {
  import spark.implicits._

  /** temp fixture dir with a documents.parquet in the Tables schema */
  private lazy val hazardDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-texthazards").toString
    Seq(
      (1L, "", "en", "src_adv", 0L),                       // empty
      (2L, "one two", "en", "src_adv", 7L),                // < n tokens
      (3L, "東京都に住", "zh", "src_adv", 5L),  // space-free CJK
      (4L, "a b c d e f g h i j", "en", "src_adv", 19L),   // windows
      (5L, "İstanbul ΣΊΣΥΦΟΣ", "en", "src_adv", 16L), // casefold hazards
      (6L, "STRASSE groß MiXeD-Case 42", "de", "src_adv", 26L),
      (7L, "Hello, World!", "en", "src_adv", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q103 fold is ASCII-only: locale-table hazards become separators") {
    // Java's FULL case mappings lower U+0130 to i + combining dot and
    // apply contextual final sigma; utf8proc SIMPLE-maps both. The
    // byte-level fold sidesteps the tables entirely: every non-ASCII
    // letter is a separator, identically on any engine.
    val norm = SparkEntry.queries("q103_text_normalize")(spark, hazardDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(norm(5L) === "stanbul")
    assert(norm(6L) === "strasse gro mixed case 42")
    assert(norm(7L) === "hello world")
    assert(norm(1L) === "")
    assert(norm(3L) === "")
  }

  test("q110 digest is NULL when a doc has no fingerprint window") {
    val out = SparkEntry.queries("q110_winnow_fingerprint")(spark, hazardDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2))).toSeq
    val (withWindows, without) = out.partition(_._1 == 4L)
    assert(without.filter(t => Set(1L, 2L, 3L)(t._1))
      .forall { case (_, n, isNull) => n == 0 && isNull },
      s"window-less docs -> 0 fingerprints, NULL digest ($out)")
    assert(withWindows.forall { case (_, n, isNull) => n > 0 && !isNull })
  }

  test("q88 quality of the empty document is NULL, not a crash") {
    val out = SparkEntry.queries("q88_text_quality")(spark, hazardDir)
      .select(col("doc_id"), col("quality"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(1L), "empty doc has no quality (ANSI-safe NULL)")
    assert(!out(7L))
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

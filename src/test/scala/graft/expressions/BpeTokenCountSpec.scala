package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Greedy longest-prefix subword counting: hand-verified segmentations,
  * word-splitting edge cases, and null/empty behavior. The engine-parity
  * proof (Spark expression == DuckDB recursive-CTE replay) is the q172
  * oracle hash check; this spec pins the Scala semantics.
  */
class BpeTokenCountSpec extends SparkSpec {
  import spark.implicits._

  private def count(s: String): Long =
    Seq(s).toDF("t")
      .select(BpeTokenCount.bpeTokenCount(col("t")).as("n"))
      .as[Long].head()

  test("greedy longest-prefix segmentation on known words") {
    // "the" is a vocab trigram -> 1 token
    assert(count("the") == 1L)
    // "theory" -> the|or|y (greedy: "the" beats "th"; "or" beats "o")
    assert(count("theory") == 3L)
    // "scanning" -> s|ca|n|n|ing: no "sc"/"scan" merge in the vocab
    assert(count("scanning") == 5L)
    // "ation" is itself a merge -> 1
    assert(count("ation") == 1L)
  }

  test("word splitting: punctuation, whitespace, non-ASCII separate") {
    assert(count("the the") == 2L)
    assert(count("the,the!the") == 3L)
    assert(count("theéthe") == 2L) // é separates: two "the" words, 1 token each
    assert(count("...") == 0L)
    assert(count("") == 0L)
  }

  test("ASCII case folds before matching; digits tokenize per char") {
    assert(count("THE") == count("the"))
    assert(count("The Theory") == count("the theory"))
    // no digit merges in the vocab: each digit is one token
    assert(count("2024") == 4L)
  }

  test("null input yields null") {
    val got = Seq[Option[String]](None).toDF("t")
      .select(BpeTokenCount.bpeTokenCount(col("t")).as("n"))
      .collect()
    assert(got.head.isNullAt(0))
  }

  test("counts are <= word-character count and >= word count") {
    val s = "sorting and filtering large distributed datasets efficiently"
    val n = count(s)
    val words = s.split(" ").length
    val chars = s.replace(" ", "").length
    assert(n >= words && n <= chars, s"n=$n words=$words chars=$chars")
  }
}

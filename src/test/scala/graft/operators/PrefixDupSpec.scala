package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class PrefixDupSpec extends SparkSpec {
  import spark.implicits._

  // the q115 core, inlined over an arbitrary frame for edge-case control
  private def flagged(texts: Seq[String]): Set[String] = {
    val w = Window.partitionBy(substring(col("t"), 1, 1)).orderBy(col("t"))
    texts.toDF("text").filter(length(col("text")) > 0)
      .select(col("text").as("t")).distinct()
      .withColumn("nxt", lead(col("t"), 1).over(w))
      .filter(col("nxt").isNotNull &&
        length(col("nxt")) > length(col("t")) &&
        col("nxt").startsWith(col("t")))
      .collect().map(_.getString(0)).toSet
  }

  test("strict prefixes flagged; exact dups and non-prefixes are not") {
    val got = flagged(Seq(
      "alpha beta",            // prefix of "alpha beta gamma" → flagged
      "alpha beta gamma",
      "alpha beta gamma",      // exact dup of the above → NOT flagged
      "alphabet",              // shares chars but not a token-or-char prefix path: "alpha beta" < "alphabet"? ' '(0x20) < 'b' so sorted between — still correctly unflagged
      "zeta",                  // no extension → not flagged
      "ze",                    // prefix of zeta → flagged
      "q"))                    // singleton block → not flagged
    assert(got == Set("alpha beta", "ze"))
  }

  test("transitive chains: every proper prefix in a chain is flagged") {
    val got = flagged(Seq("a", "a b", "a b c", "a b c d"))
    assert(got == Set("a", "a b", "a b c"))
  }

  test("the adjacency argument holds with interleaved non-matching texts") {
    // "ab" is a prefix of "abz"; "ac..." sorts BETWEEN them? No: 'c' > 'b'
    // puts it after — the range argument the operator relies on
    val got = flagged(Seq("ab", "abz", "ac middle text", "abq"))
    // "ab" < "abq" < "abz" — ab's successor is abq (extension) → flagged
    assert(got == Set("ab"))
  }
}

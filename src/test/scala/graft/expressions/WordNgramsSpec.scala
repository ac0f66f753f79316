package graft.expressions

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class WordNgramsSpec extends SparkSpec {
  import spark.implicits._

  // the Column formulations WordNgrams replaced — kept here as the
  // equivalence oracle
  private def hofDistinct(text: Column, n: Int): Column = {
    val tok = split(text, " ")
    when(size(tok) >= n,
      array_distinct(transform(
        sequence(lit(0), size(tok) - n),
        i => concat_ws(" ", slice(tok, i + lit(1), lit(n))))))
      .otherwise(array().cast("array<string>"))
  }
  private def hofAll(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (1 to n).map(k => element_at(toks, i + k)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  private def edgeDocs = Seq(
    "",                       // one empty token
    "one",                    // shorter than n
    "a b",                    // exactly n for n=2
    "a  b   c",               // multi-space runs → empty tokens
    "dup dup dup dup",        // duplicate grams
    "the quick brown fox jumps over the lazy dog the quick brown fox"
  ).toDF("text")

  test("distinct variant is element-identical (incl. order) to the HOF form") {
    for (n <- Seq(1, 2, 3)) {
      val both = edgeDocs.union(Tables.documents(spark, sfDir).select("text").limit(100))
        .select(WordNgrams.wordNgrams(col("text"), n).as("e"),
          hofDistinct(col("text"), n).as("h"))
      assert(both.filter(not(col("e") <=> col("h"))).count() == 0, s"n=$n")
    }
  }

  test("all variant is element-identical (incl. order and dups) to the HOF form") {
    for (n <- Seq(1, 3)) {
      val both = edgeDocs.union(Tables.documents(spark, sfDir).select("text").limit(100))
        .select(WordNgrams.wordNgramsAll(col("text"), n).as("e"),
          hofAll(col("text"), n).as("h"))
      assert(both.filter(not(col("e") <=> col("h"))).count() == 0, s"n=$n")
    }
  }

  test("wordChunks = non-overlapping full n-token chunks (the q106 line unit)") {
    // 10 tokens, n=4 → floor(10/4)=2 full chunks; trailing partial dropped
    val r = Seq("t0 t1 t2 t3 t4 t5 t6 t7 t8 t9", "a b c", "")
      .toDF("text")
      .select(WordNgrams.wordChunks(col("text"), 4).as("c")).collect()
    assert(r(0).getSeq[String](0) == Seq("t0 t1 t2 t3", "t4 t5 t6 t7"))
    assert(r(1).getSeq[String](0).isEmpty && r(2).getSeq[String](0).isEmpty)
  }

  test("null text yields null, not a crash") {
    val r = Seq(Option.empty[String], Some("a b c")).toDF("text")
      .select(WordNgrams.wordNgrams(col("text"), 2).as("g")).collect()
    assert(r(0).isNullAt(0) && r(1).getSeq[String](0) == Seq("a b", "b c"))
  }
}

package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CharCountsSpec extends SparkSpec {
  import CharCounts.charCounts

  /** the explode + groupBy reference form the expression replaces */
  private def referenceCounts(texts: Seq[String]): Set[(Int, String, Long)] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
      .select(col("id"), explode(split(col("text"), "")).as("ch"))
      .groupBy(col("id"), col("ch")).agg(count(lit(1)).as("c"))
      .as[(Int, String, Long)].collect().toSet
  }

  private def exprCounts(texts: Seq[String]): Set[(Int, String, Long)] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
      .select(col("id"), explode(charCounts(col("text"))).as("e"))
      .select(col("id"), col("e.ch"), col("e.c"))
      .as[(Int, String, Long)].collect().toSet
  }

  test("histogram matches the explode+groupBy form on edge strings") {
    val texts = Seq("", "a", "aa", "abcabc", "the the  the", "ñañá é",
      "a b", " leading", "trailing ", "  ", "x\ty\nz", "ab" * 300)
    assert(exprCounts(texts) == referenceCounts(texts))
  }

  test("histogram matches the explode+groupBy form on the fixture corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("text")).limit(200).collect().map(_.getString(0)).toSeq
    assert(exprCounts(docs) == referenceCounts(docs))
  }

  test("first-occurrence order and total mass") {
    import spark.implicits._
    val row = Seq("abca").toDF("text")
      .select(charCounts(col("text")).as("c"))
      .selectExpr("transform(c, x -> x.ch) AS chs",
        "aggregate(c, 0L, (a, x) -> a + x.c) AS n")
      .as[(Seq[String], Long)].head()
    assert(row._1 == Seq("a", "b", "c") && row._2 == 4L)
  }

  test("null text yields null, not a crash") {
    import spark.implicits._
    val df = Seq(Option.empty[String], Some("ab")).toDF("text")
      .select(charCounts(col("text")).as("c"))
    assert(df.filter(col("c").isNull).count() == 1)
  }
}

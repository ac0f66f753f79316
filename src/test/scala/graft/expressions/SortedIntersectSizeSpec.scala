package graft.expressions

import graft.SparkSpec
import graft.functions.Dedup
import org.apache.spark.sql.functions._

class SortedIntersectSizeSpec extends SparkSpec {
  import spark.implicits._

  test("merge intersect matches array_intersect size on sorted long arrays") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 5L, 9L)),
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq.empty[Long], Seq(1L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))).toDF("a", "b")
    val got = df.select(
      SortedIntersectSize.sizeOfIntersect(col("a"), col("b")).as("m"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("agrees with built-in on the real token-id corpus (codegen path)") {
    val toks = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), Dedup.tokenIds(col("text")).as("t"))
    val pairs = toks.as("a").join(toks.as("b"),
        col("a.doc_id") < col("b.doc_id") && col("a.doc_id") < 30)
      .select(
        SortedIntersectSize.sizeOfIntersect(col("a.t"), col("b.t")).as("m"),
        size(array_intersect(col("a.t"), col("b.t"))).as("ref"))
    assert(pairs.filter(col("m") =!= col("ref")).count() == 0)
    assert(pairs.count() > 1000)
  }

  test("null input yields null, type mismatch is rejected at analysis") {
    val df = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    val r = df.select(
      SortedIntersectSize.sizeOfIntersect(col("a"), col("b")).as("m")).collect()
    assert(r.head.isNullAt(0))
    val bad = Seq(("x", Seq(1L))).toDF("a", "b")
    intercept[Exception] {
      bad.select(SortedIntersectSize.sizeOfIntersect(col("a"), col("b"))).collect()
    }
  }

  test("SQL surface via GraftExtensions: sorted_intersect_size callable from spark.sql") {
    graft.plans.GraftExtensions.register(spark)
    val n = spark.sql(
      "SELECT sorted_intersect_size(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS n")
      .head.getInt(0)
    assert(n == 2)
    val err = intercept[Exception] {
      spark.sql("SELECT sorted_intersect_size(array('a'), array(1L))").collect()
    }
    assert(err.getMessage.contains("array<bigint>"))
  }
}

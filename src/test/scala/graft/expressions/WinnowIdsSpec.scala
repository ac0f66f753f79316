package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowIdsSpec extends SparkSpec {
  import spark.implicits._

  private def fps(texts: Seq[String], n: Int = 3, w: Int = 4): Seq[Set[Long]] =
    texts.toDF("text")
      .select(WinnowIds.winnowIds(col("text"), n, w).as("fp"))
      .collect().map(_.getSeq[Long](0).toSet).toSeq

  test("edges: short docs, single-window docs, determinism") {
    val Seq(empty, short, exactOneGram, fewGrams) =
      fps(Seq("", "a b", "a b c", "a b c d e"))
    assert(empty.isEmpty && short.isEmpty)
    // m=1 gram < w ⇒ global min = that gram's hash (one fingerprint)
    assert(exactOneGram.size == 1)
    // m=3 grams < w=4 ⇒ still exactly the global min
    assert(fewGrams.size == 1)
    assert(fps(Seq("a b c d e")) == fps(Seq("a b c d e"))) // deterministic
  }

  test("output is sorted distinct and density ≈ 2/(w+1) on real docs") {
    val rows = graft.Tables.documents(spark, sfDir).limit(100)
      .select(WinnowIds.winnowIds(col("text"), 3, 4).as("fp"),
        (size(split(col("text"), " ")) - 2).as("m"))
      .collect()
    rows.foreach { r =>
      val fp = r.getSeq[Long](0)
      assert(fp == fp.sorted && fp.distinct.size == fp.size)
      assert(fp.forall(x => x >= 0L && x < (1L << 60)))
      // selection count bounded by window count, and not degenerate
      val m = r.getInt(1)
      assert(fp.size <= math.max(m - 3, 1) && fp.nonEmpty)
    }
  }

  test("positional coverage: any shared run of ≥ n+w−1 tokens shares a fingerprint") {
    // the winnowing guarantee that bottom-k sketches lack
    val shared = "alpha beta gamma delta epsilon zeta" // 6 = n+w−1 tokens
    val a = s"completely different prefix words here $shared and then some tail"
    val b = s"$shared with an entirely unrelated continuation of text"
    val Seq(fa, fb) = fps(Seq(a, b))
    assert(fa.intersect(fb).nonEmpty,
      "documents sharing a 6-token run must share a winnowing fingerprint")
  }

  test("matches the SQL-replayable formulation (oracle parity shape)") {
    // recompute via the Column/HOF formulation the DuckDB oracle mirrors
    val df = graft.Tables.documents(spark, sfDir).limit(40)
      .select(col("doc_id"), col("text"))
    val viaExpr = df.select(col("doc_id"),
      WinnowIds.winnowIds(col("text"), 3, 4).as("fp"))
    val viaHof = df
      .withColumn("grams", graft.expressions.WordNgrams.wordNgramsAll(col("text"), 3))
      .withColumn("hs", expr(
        "transform(grams, g -> cast(conv(substring(md5(g), 1, 15), 16, 10) as long))"))
      .withColumn("fp", expr(
        "array_sort(array_distinct(transform(" +
          "sequence(0, greatest(size(hs) - 4, 0)), " +
          "i -> array_min(slice(hs, i + 1, 4)))))"))
      .select(col("doc_id"), col("fp"))
    assert(viaExpr.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap ==
      viaHof.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap)
  }
}

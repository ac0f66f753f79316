package graft.expressions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generator-driven equivalence fuzzing for the byte-level codegen
  * expressions against their Column/HOF reference formulations. The
  * expressions tokenize RAW UTF-8 BYTES on 0x20 — these properties pin
  * that multi-byte code points (which never contain 0x20 in UTF-8),
  * empty tokens from space runs, and leading/trailing spaces all behave
  * exactly like `split(text, " ")`. Fixed seeds: deterministic.
  */
class ExpressionFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  // tokens mixing ASCII, 2-byte (é, ß), 3-byte (日, 本), and 4-byte (𝄞)
  // code points, plus the empty token; texts join with 1-3 spaces
  private val tokGen: Gen[String] = Gen.oneOf(
    "a", "bb", "ccc", "é", "ßß", "日本", "語", "𝄞clef", "mixé日", "")
  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 12)
    toks <- Gen.listOfN(n, tokGen)
    seps <- Gen.listOfN(math.max(n - 1, 0), Gen.chooseNum(1, 3))
  } yield toks.zipAll(seps.map(" " * _), "", "").map { case (t, s) => t + s }
    .mkString

  private def fuzzDf = (samples(textGen, 120) ++ Seq("", " ", "  ", "é",
    "日 本 語")).toDF("text")

  test("WordNgrams ≡ HOF on unicode/space fuzz (distinct + all + chunks)") {
    val df = fuzzDf
    def hofAll(n: Int) = {
      val toks = split(col("text"), " ")
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n), i =>
          concat_ws(" ", (1 to n).map(k => element_at(toks, i + k)): _*)))
        .otherwise(array().cast("array<string>"))
    }
    for (n <- Seq(1, 2, 3)) {
      val bad = df.select(
        WordNgrams.wordNgramsAll(col("text"), n).as("e"),
        hofAll(n).as("h")).filter(not(col("e") <=> col("h")))
      assert(bad.count() == 0, s"all n=$n:\n${bad.head(3).mkString("\n")}")
      val badD = df.select(
        WordNgrams.wordNgrams(col("text"), n).as("e"),
        array_distinct(hofAll(n)).as("h")).filter(not(col("e") <=> col("h")))
      assert(badD.count() == 0, s"distinct n=$n")
    }
    // chunks = every stride-th gram, full windows only
    val badC = df.select(
      WordNgrams.wordChunks(col("text"), 3).as("e"),
      expr("filter(transform(" +
        "coalesce(transform(sequence(0, size(split(text,' ')) - 3), i -> i), array()), " +
        "i -> IF(i % 3 = 0, array_join(slice(split(text,' '), i+1, 3), ' '), null)), " +
        "x -> x is not null)").as("h"))
      .filter(size(split(col("text"), " ")) >= 3)
      .filter(not(col("e") <=> col("h")))
    assert(badC.count() == 0, s"chunks:\n${badC.head(3).mkString("\n")}")
  }

  test("MinHashBands ≡ Column formulation on unicode/space fuzz") {
    import graft.functions.MinHashLSH
    val df = fuzzDf.withColumn("doc_id", monotonically_increasing_id())
    val viaExpr = df.select(col("doc_id"),
      MinHashBands.bandKeys(col("text"), 8, 4).as("bands"))
    val viaCols = MinHashLSH.withSignature(df, "text", 8)
      .select(col("doc_id"), array(MinHashLSH.bandKeys(8, 4): _*).as("bands"))
    val joined = viaExpr.as("a").join(viaCols.as("b"), "doc_id")
      .filter(not(col("a.bands") <=> col("b.bands")))
    assert(joined.count() == 0, joined.head(3).mkString("\n"))
  }

  test("WinnowIds ≡ HOF formulation on unicode/space fuzz") {
    val df = fuzzDf
    val bad = df
      .withColumn("e", WinnowIds.winnowIds(col("text"), 2, 3))
      .withColumn("grams", WordNgrams.wordNgramsAll(col("text"), 2))
      .withColumn("hs", expr(
        "transform(grams, g -> cast(conv(substring(md5(g), 1, 15), 16, 10) as long))"))
      .withColumn("h", expr(
        "IF(size(hs) = 0, array(), array_sort(array_distinct(transform(" +
          "sequence(0, greatest(size(hs) - 3, 0)), " +
          "i -> array_min(slice(hs, i + 1, 3))))))"))
      .filter(not(col("e") <=> col("h")))
    assert(bad.count() == 0, bad.head(3).mkString("\n"))
  }

  test("fixture sanity: expressions agree with HOFs on real document text") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val bad = docs.select(
      WordNgrams.wordNgrams(col("text"), 3).as("e"),
      array_distinct(expr(
        "transform(sequence(0, size(split(text,' ')) - 3), " +
          "i -> array_join(slice(split(text,' '), i+1, 3), ' '))")).as("h"))
      .filter(size(split(col("text"), " ")) >= 3)
      .filter(not(col("e") <=> col("h")))
    assert(bad.count() == 0)
  }
}

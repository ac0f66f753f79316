package graft.expressions

import graft.SparkSpec
import graft.functions.Dedup
import org.apache.spark.sql.functions._

class ShingleIdsSpec extends SparkSpec {
  import spark.implicits._

  private def ids(texts: Seq[String], n: Int) =
    texts.toDF("t").select(ShingleIds.shingleIds(col("t"), n).as("ids"))
      .as[Array[Long]].collect()

  test("output is ascending-sorted and distinct (SortedIntersectSize precondition)") {
    val rows = ids(Seq("d c b a a b c d", "x", "m n m n m"), 1) ++
      ids(Seq("a b c a b c a b c d"), 3)
    rows.foreach { arr =>
      assert(arr.toSeq == arr.toSeq.sorted)
      assert(arr.toSet.size == arr.length)
    }
  }

  test("set sizes match the string formulation, including empty-token edge cases") {
    val texts = Seq("a b c", "a  b", " leading", "trailing ", "", " ",
      "one", "a a a a", "a b a b a b c")
    for (n <- Seq(1, 2, 3)) {
      val viaIds = texts.toDF("t")
        .select(size(ShingleIds.shingleIds(col("t"), n)).as("s"))
        .as[Int].collect().toSeq
      val viaStrings = texts.toDF("t")
        .select(size(when(lit(n) === 1, array_distinct(split(col("t"), " ")))
          .otherwise(Dedup.ngrams(col("t"), n))).as("s"))
        .as[Int].collect().toSeq
      assert(viaIds == viaStrings, s"n=$n: $viaIds vs $viaStrings")
    }
  }

  test("shorter-than-n text yields an EMPTY array (oracle parity with ngrams)") {
    assert(ids(Seq("a b"), 3).head.isEmpty)
    assert(ids(Seq(""), 2).head.isEmpty)
  }

  test("ids are deterministic and order-sensitive across gram boundaries") {
    val a = ids(Seq("a b c"), 3).head
    val b = ids(Seq("a b c"), 3).head
    assert(a.toSeq == b.toSeq)
    // reversed token order ⇒ different gram id
    assert(ids(Seq("c b a"), 3).head.toSeq != a.toSeq)
  }

  test("tuple identity, not string concatenation, defines a gram " +
    "(space-free tokens make them equivalent)") {
    // "a b" as 2 tokens vs "a" "b" — same tuple, same id; distinct docs
    // with the same token stream get identical id sets
    assert(ids(Seq("a b x"), 2).head.toSeq == ids(Seq("a b x"), 2).head.toSeq)
    // jaccard via ids equals jaccard via strings on a crafted pair
    val df = Seq(("a b c d", "b c d e")).toDF("x", "y")
    val viaIds = df.select(Dedup.jaccardSortedIds(
      Dedup.tokenIds(col("x")), Dedup.tokenIds(col("y"))).as("j"))
      .as[Double].head()
    val viaStrings = df.select(Dedup.jaccard(
      array_distinct(split(col("x"), " ")),
      array_distinct(split(col("y"), " "))).as("j"))
      .as[Double].head()
    assert(viaIds == viaStrings)
  }

  test("null text yields null; non-string input rejected at analysis") {
    val r = Seq[Option[String]](None).toDF("t")
      .select(ShingleIds.shingleIds(col("t"), 1).as("ids")).collect()
    assert(r.head.isNullAt(0))
    intercept[Exception] {
      Seq(1L).toDF("x").select(ShingleIds.shingleIds(col("x"), 1)).collect()
    }
  }
}

package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class SortedLowerBoundSpec extends SparkSpec {
  import spark.implicits._

  private val cuts = Array("cherry", "mango", "peach")

  test("count of cuts <= t: below-first, ties, between, above-last") {
    val got = Seq("apple", "cherry", "kiwi", "mango", "melon", "peach",
      "zucchini", "")
      .toDF("t")
      .select(col("t"),
        SortedLowerBound.bucketOf(col("t"), cuts).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("apple" -> 0, "" -> 0, // before the first cut
      "cherry" -> 1, // tie goes to the higher bucket (<=)
      "kiwi" -> 1, "mango" -> 2, "melon" -> 2,
      "peach" -> 3, "zucchini" -> 3))
  }

  test("null in, null out; empty cut set puts everything in bucket 0") {
    val withNull = Seq(Some("x"), None).toDF("t")
      .select(SortedLowerBound.bucketOf(col("t"), Array.empty[String]))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(withNull.toSet == Set(Some(0), None))
  }

  test("interpreted eval == codegen'd path == reference scan, " +
    "generated cut sets (incl. non-ASCII and shared long prefixes)") {
    val rnd = new scala.util.Random(7)
    val pool = (1 to 60).map(_ => rnd.alphanumeric.take(rnd.nextInt(12))
      .mkString + (if (rnd.nextBoolean()) "é中" else ""))
    val cutSet = pool.distinct.sorted.take(17).toArray
    val probes = pool ++ cutSet ++ Seq("", "￿", "a" * 200)
    val utf8Cuts = cutSet.map(UTF8String.fromString)
    val reference = probes.map(p =>
      p -> cutSet.count(_ <= p)).toMap
    // interpreted (object API)
    probes.foreach { p =>
      assert(SortedLowerBound.countLeq(utf8Cuts,
        UTF8String.fromString(p)) == reference(p), s"countLeq($p)")
    }
    // codegen'd (through a real scan)
    val got = probes.toDF("t")
      .select(col("t"), SortedLowerBound.bucketOf(col("t"), cutSet).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1))
    got.foreach { case (p, b) => assert(b == reference(p), s"codegen($p)") }
  }

  test("generated code size is constant in the cut count (the reason " +
    "this beats a when-chain at cluster-scale bucket knobs)") {
    val big = (1 to 400).map(i => f"cut$i%05d").toArray
    val n = Seq("cut00200x").toDF("t")
      .select(SortedLowerBound.bucketOf(col("t"), big))
      .collect()(0).getInt(0)
    assert(n == 200) // <= "cut00200x": cut00001..cut00200
  }
}

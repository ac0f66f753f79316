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
    "generated cut sets (incl. non-ASCII, supplementary-plane chars, " +
    "and shared long prefixes)") {
    val ord = SortedLowerBound.utf8Ordering
    val rnd = new scala.util.Random(7)
    // decorations deliberately mix a BMP-tail char (U+E000, private use)
    // with a surrogate-pair emoji (U+1F600): UTF-16 code-unit order puts
    // the emoji BELOW U+E000, UTF-8 byte order puts it ABOVE — the
    // divergence the utf8Ordering contract exists for
    val deco = Seq("", "\u00e9\u4e2d", "\ue000", "\ud83d\ude00")
    val pool = (1 to 60).map(_ => rnd.alphanumeric.take(rnd.nextInt(12))
      .mkString + deco(rnd.nextInt(deco.length)))
    val cutSet = pool.distinct.sorted(ord).take(17)
      .distinct.sorted(ord).toArray
    val probes = pool ++ cutSet ++
      Seq("", "\uffff", "a" * 200, "\ue000", "\ud83d\ude00", "x",
        "x\ud83d\ude00")
    val utf8Cuts = cutSet.map(UTF8String.fromString).toIndexedSeq
    // the reference counts under the UTF-8 comparator — the same order
    // Spark sorts strings in (a `_ <= p` String oracle would share the
    // expression's hypothetical UTF-16 bug instead of catching it)
    val reference = probes.map(p =>
      p -> cutSet.count(c => ord.compare(c, p) <= 0)).toMap
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

  test("supplementary-plane vs BMP-tail cuts: bucket ids follow UTF-8 " +
    "byte order (UTF-16 .sorted would transpose these cuts)") {
    // U+1F600 (😀, F0 9F 98 80) sorts ABOVE U+E000 (EE 80 80) in UTF-8
    // bytes but BELOW it in UTF-16 code units — cuts sorted with plain
    // .sorted would violate the binary search's precondition here
    val raw = Array("\ud83d\ude00", "\ue000")
    assert(raw.sorted.toSeq == Seq("\ud83d\ude00", "\ue000"),
      "UTF-16 order sanity")
    val cuts = raw.distinct.sorted(SortedLowerBound.utf8Ordering)
    assert(cuts.toSeq == Seq("\ue000", "\ud83d\ude00"))
    val got = Seq("\u9fff", "\ue000", "\uefff", "\ud83d\ude00",
        "\ud83d\ude00!")
      .toDF("t")
      .select(col("t"), SortedLowerBound.bucketOf(col("t"), cuts).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got("\u9fff") == 0)  // below U+E000
    assert(got("\ue000") == 1)  // == first cut (tie goes up)
    assert(got("\uefff") == 1)  // between the cuts in UTF-8 order
    assert(got("\ud83d\ude00") == 2)  // == second cut
    assert(got("\ud83d\ude00!") == 2)
  }

  test("structural equality: two identical instances are semanticEquals " +
    "(cuts held as IndexedSeq, not Array — CSE/exchange-reuse matching)") {
    import org.apache.spark.sql.GraftColumn
    def mk() = GraftColumn.expr(
      SortedLowerBound.bucketOf(col("t"), Array("b", "m")))
    assert(mk() == mk(), "case-class equality must compare cut contents")
    assert(mk().semanticEquals(mk()),
      "identical bucket-assign expressions must canonicalize equal")
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

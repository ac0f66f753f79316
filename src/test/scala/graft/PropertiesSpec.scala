package graft

import graft.functions.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generator-driven properties (SURVEY §5.2.2) over the set/similarity
  * algebra — ScalaCheck `Gen` with fixed seeds (deterministic), evaluated
  * through Spark columns on tiny generated frames.
  */
class PropertiesSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val tokGen: Gen[List[String]] =
    Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f")))

  test("jaccard ∈ [0,1], symmetric, 1 iff equal sets (generated)") {
    val cases = samples(Gen.zip(tokGen, tokGen), 25)
    val df = cases.map { case (x, y) => (x.distinct, y.distinct) }.toDF("x", "y")
    val got = df.select(col("x"), col("y"),
      Dedup.jaccard(col("x"), col("y")).as("xy"),
      Dedup.jaccard(col("y"), col("x")).as("yx")).collect()
    got.foreach { r =>
      val (xy, yx) = (r.getDouble(2), r.getDouble(3))
      assert(xy >= 0.0 && xy <= 1.0)
      assert(xy == yx)
      if (r.getSeq[String](0).toSet == r.getSeq[String](1).toSet)
        assert(xy == 1.0)
    }
  }

  test("union cardinality: |A ∪ B| = |A| + |B| - |A ∩ B| (generated key sets)") {
    val cases = samples(
      Gen.zip(Gen.listOf(Gen.chooseNum(0, 30)), Gen.listOf(Gen.chooseNum(0, 30))), 10)
    cases.foreach { case (a, b) =>
      val da = a.distinct.toDF("k")
      val db = b.distinct.toDF("k")
      val u = da.union(db).distinct().count()
      val i = da.intersect(db).count()
      assert(u == a.distinct.size + b.distinct.size - i)
    }
  }

  test("exact dedup idempotence on generated duplicate-heavy frames") {
    val cases = samples(Gen.listOfN(20, Gen.oneOf("x", "y", "z")), 5)
    cases.foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val once = Dedup.exact(df, "id", Seq("text"))
      val twice = Dedup.exact(once, "id", Seq("text"))
      assert(once.count() == twice.count())
      assert(once.count() == texts.distinct.size.toLong)
    }
  }

  test("range join == naive inequality join on generated interval sets") {
    import graft.operators.RangeJoin
    val ptGen = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(-50L, 150L)))
    val ivGen = Gen.listOfN(25, Gen.zip(Gen.chooseNum(1L, 4L),
      Gen.chooseNum(-60L, 140L), Gen.chooseNum(0L, 40L)))
    samples(Gen.zip(ptGen, ivGen), 4).zipWithIndex.foreach {
      case ((ps, ivs), caseIdx) =>
        val points = ps.zipWithIndex
          .map { case ((k, at), i) => (i.toLong, k, at) }
          .toDF("pid", "k", "at")
        val intervals = ivs.zipWithIndex
          .map { case ((k, from, len), i) => (i.toLong, k, from, from + len) }
          .toDF("iid", "k", "from", "to") // len=0 ⇒ empty interval
        val naive = points.join(intervals.filter(col("to") > col("from")),
            points("k") === intervals("k") &&
              points("at") >= intervals("from") && points("at") < intervals("to"))
          .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
        for (w <- Seq(7L, 32L)) {
          val got = RangeJoin.pointInInterval(points, intervals, Seq("k"),
              "at", "from", "to", binWidth = w)
            .select(col("pid"), col("iid")).as[(Long, Long)].collect()
          assert(got.length == got.toSet.size, s"case $caseIdx w=$w: dup pair")
          assert(got.toSet == naive, s"case $caseIdx w=$w")
        }
    }
  }

  test("sessionize: session count = gap crossings + 1 (generated event times)") {
    import graft.operators.Sessionize
    val gapS = 600L
    val tsGen = Gen.listOfN(40, Gen.chooseNum(0L, 20000L))
    samples(tsGen, 5).foreach { offsets =>
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val ev = offsets.zipWithIndex
        .map { case (s, i) =>
          (1L, i.toLong, new java.sql.Timestamp(base + s * 1000)) }
        .toDF("user_id", "event_id", "ts")
      val maxSeq = Sessionize.assign(ev, Seq("user_id"), "ts",
          s"$gapS SECOND", Seq("event_id"))
        .agg(max(col("session_seq"))).head().getLong(0)
      // ground truth from the sorted offsets: a session starts at every
      // STRICTLY-greater-than-gap jump
      val sorted = offsets.sorted
      val expected = 1 + sorted.zip(sorted.tail).count {
        case (a, b) => b - a > gapS }
      assert(maxSeq == expected, s"offsets=$sorted")
    }
  }

  test("ExactPercentile == percentile() bit-for-bit on generated weighted " +
    "multisets and random percentiles") {
    import graft.functions.ExactPercentile
    // random group sizes (1..60), heavy duplication (values 0..9 scaled),
    // random percentile points including the exact endpoints
    val groupGen = Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 9L).map(_ * 17L)))
    val psGen = Gen.listOfN(4, Gen.chooseNum(0, 1000).map(_ / 1000.0))
    samples(Gen.zip(groupGen, psGen), 8).zipWithIndex.foreach {
      case ((vals, ps0), i) =>
        val ps = (ps0 ++ Seq(0.0, 1.0, 0.5)).distinct
        val df = vals.zipWithIndex
          .map { case (v, j) => (s"g${j % 3}", v) }.toDF("k", "v")
        val aliases = ps.indices.map(j => s"p$j")
        val want = df.groupBy(col("k"))
          .agg(expr(s"percentile(v, ${ps.head})").as(aliases.head),
            ps.tail.zip(aliases.tail).map { case (p, a) =>
              expr(s"percentile(v, $p)").as(a) }: _*)
          .orderBy(col("k")).collect()
        val got = ExactPercentile.of(df, Seq("k"), "v", ps.zip(aliases))
          .orderBy(col("k")).collect()
        assert(got.length == want.length, s"case $i")
        want.zip(got).foreach { case (w, g) =>
          ps.indices.foreach { j =>
            assert(java.lang.Double.doubleToLongBits(w.getDouble(j + 1)) ==
              java.lang.Double.doubleToLongBits(g.getDouble(j + 1)),
              s"case $i k=${w.getString(0)} p=${ps(j)}: " +
                s"${w.getDouble(j + 1)} vs ${g.getDouble(j + 1)}")
          }
        }
    }
  }

  test("cosine self-similarity is exactly 1 after rounding (all fixture vectors)") {
    val emb = Tables.embeddings(spark, sfDir = "/root/testdata/sf0.001")
    val self = emb.select(
      round(Det.dotD(col("embedding"), col("embedding")) /
        (Det.l2norm(col("embedding")) * Det.l2norm(col("embedding"))), 6).as("c"))
    assert(self.filter(col("c") =!= 1.0).count() == 0)
  }

  test("q162/q168 pmod floor-div == floor semantics incl. NEGATIVE cent " +
    "sums (generated)") {
    // the r6 latent divergence: Spark DIV truncates, DuckDB // floors —
    // the backported identity (num - pmod(num, den)) DIV den must equal
    // Math.floorDiv for every sign of num (refund-heavy days/weekdays),
    // positive den contract. Generator covers negatives, exact multiples,
    // and |num| < den corner cases.
    val cases = samples(Gen.zip(
      Gen.chooseNum(-2000000L, 2000000L),
      Gen.chooseNum(1L, 127L)), 60)
    val got = cases.toDF("num", "den")
      .withColumn("fd", expr("(num - pmod(num, den)) DIV den"))
      .withColumn("trunc", expr("num DIV den"))
      .collect()
    var truncDiverged = false
    got.foreach { r =>
      val (num, den) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == Math.floorDiv(num, den),
        s"floor-div identity broke at $num / $den")
      if (r.getLong(3) != Math.floorDiv(num, den)) truncDiverged = true
    }
    // the test only proves something if plain DIV actually diverges on
    // this sample (negative non-multiples present)
    assert(truncDiverged, "sample never exercised the truncate≠floor case")
  }

  test("Det.floorDivSql / epochDaySql == Math.floorDiv incl. pre-epoch " +
    "timestamps (the r7 backport to every day/week bucketing)") {
    // every epoch-day site now routes through Det.floorDivSql; pin the
    // helper itself to floor semantics on negative numerators (pre-epoch
    // µs, negative day deltas) and the day constant used everywhere
    val dayUs = 86400000000L
    val cases = samples(
      Gen.chooseNum(-5L * dayUs, 5L * dayUs), 80) ++
      Seq(-dayUs, -1L, 0L, 1L, dayUs, -dayUs - 1, -dayUs + 1)
    val got = cases.toDF("us")
      .withColumn("fd", expr(graft.Det.floorDivSql("us", dayUs.toString)))
      .withColumn("trunc", expr(s"us DIV $dayUs"))
      .collect()
    var truncDiverged = false
    got.foreach { r =>
      val us = r.getLong(0)
      assert(r.getLong(1) == Math.floorDiv(us, dayUs),
        s"floorDivSql broke at $us")
      if (r.getLong(2) != Math.floorDiv(us, dayUs)) truncDiverged = true
    }
    assert(truncDiverged, "sample never exercised a pre-epoch timestamp")
  }
}

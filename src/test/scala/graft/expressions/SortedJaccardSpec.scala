package graft.expressions

import graft.SparkSpec
import graft.functions.Dedup
import org.apache.spark.sql.functions._

/** Round-12 optimization spec: [[SortedJaccard]] fuses the two
  * `sorted_intersect_size` evaluations of the old
  * `sis / (|A|+|B|−sis)` composition into one merge pass. The hash gate
  * requires BIT-identical doubles, so the reference here is the exact
  * old expression tree, compared with === (no tolerance).
  */
class SortedJaccardSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-12 composition, verbatim. */
  private def oldJaccard(a: org.apache.spark.sql.Column,
                         b: org.apache.spark.sql.Column) = {
    val inter = SortedIntersectSize.sizeOfIntersect(a, b).cast("double")
    inter / (size(a).cast("double") + size(b).cast("double") - inter)
  }

  test("bit-identical to the old two-pass composition on edge shapes") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 5L, 9L)),   // partial overlap
      (Seq(1L, 2L), Seq(3L, 4L)),               // disjoint -> 0.0
      (Seq.empty[Long], Seq(1L)),               // empty vs nonempty -> 0.0
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),       // identical -> 1.0
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, 7L)))
      .toDF("a", "b")
    val got = df.select(
      SortedJaccard.jaccard(col("a"), col("b")).as("j"),
      oldJaccard(col("a"), col("b")).as("ref")).collect()
    got.foreach { r =>
      val j = r.getDouble(0); val ref = r.getDouble(1)
      // compare raw bits so NaN == NaN and -0.0 != 0.0
      assert(java.lang.Double.doubleToRawLongBits(j) ==
        java.lang.Double.doubleToRawLongBits(ref), r.toString)
    }
  }

  test("two empty arrays: NaN, where the old ANSI Divide THREW (edge unreachable from declared callers)") {
    // The 0/0 denominator only arises for a pair of EMPTY arrays. No
    // declared caller can produce one: tokenIds of any string yields >= 1
    // id, and the q86/q75 prefix index explodes empty gram arrays to zero
    // candidate rows. Under ANSI the old composition threw DIVIDE_BY_ZERO
    // on that unreachable edge; the fused expression returns IEEE NaN.
    // NOTE (r12 ADVICE): Spark SQL orders NaN GREATER than every double,
    // so `NaN >= t` is TRUE -- a hypothetical empty-empty pair would be
    // KEPT by the verify filters, not dropped. Harmless only because the
    // edge is unreachable (tokenIds/gramIds never emit empty candidate
    // arrays); this test pins the NaN value itself, not a keep/drop.
    val df = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
    val j = df.select(SortedJaccard.jaccard(col("a"), col("b")).as("j"))
      .head.getDouble(0)
    assert(j.isNaN)
    intercept[Exception] {
      df.select(oldJaccard(col("a"), col("b"))).collect()
    }
  }

  test("bit-identical on the real token-id corpus (codegen path)") {
    val toks = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), Dedup.tokenIds(col("text")).as("t"))
    val pairs = toks.as("a").join(toks.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(SortedJaccard.jaccard(col("a.t"), col("b.t")).as("j"),
        oldJaccard(col("a.t"), col("b.t")).as("ref"))
    // === on doubles: any non-bit-identical pair (incl. NaN mismatch via
    // null-safe compare on the raw bits) fails
    val diff = pairs.filter(
      !(col("j") <=> col("ref"))).count()
    assert(diff == 0)
    assert(pairs.count() > 100)
  }

  test("null input yields null, type mismatch is rejected at analysis") {
    val df = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    val r = df.select(SortedJaccard.jaccard(col("a"), col("b")).as("j"))
      .collect()
    assert(r.head.isNullAt(0))
    val bad = Seq(("x", Seq(1L))).toDF("a", "b")
    intercept[Exception] {
      bad.select(SortedJaccard.jaccard(col("a"), col("b"))).collect()
    }
  }

  test("SQL surface via GraftExtensions: sorted_jaccard callable from spark.sql") {
    graft.plans.GraftExtensions.register(spark)
    val j = spark.sql(
      "SELECT sorted_jaccard(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS j")
      .head.getDouble(0)
    assert(j == 2.0 / 4.0)
  }

  test("length prefilter bound is exact: min/max division dominates the verify value") {
    // the round-12 prefilter keeps a pair iff fl(min/max) >= t; prove on
    // the real corpus that every pair passing the verify filter
    // (jaccard >= t) also passes the prefilter, for the thresholds the
    // declared queries use (monotone correctly-rounded division argument)
    val toks = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), Dedup.tokenIds(col("text")).as("t"))
    val pairs = toks.as("a").join(toks.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(SortedJaccard.jaccard(col("a.t"), col("b.t")).as("j"),
        size(col("a.t")).as("na"), size(col("b.t")).as("nb"))
    for (t <- Seq(0.4, 0.8, 0.9)) {
      val violating = pairs.filter(col("j") >= t &&
        !(least(col("na"), col("nb")).cast("double") /
          greatest(col("na"), col("nb")).cast("double") >= t)).count()
      assert(violating == 0, s"threshold $t dropped a qualifying pair")
      // and the integer forms used by q81 (5min>=4max) / q85 (10min>=9max)
      val intForm = if (t == 0.8) Some((5, 4))
        else if (t == 0.9) Some((10, 9)) else None
      intForm.foreach { case (p, q) =>
        val v2 = pairs.filter(col("j") >= t &&
          !(lit(p) * least(col("na"), col("nb")) >=
            lit(q) * greatest(col("na"), col("nb")))).count()
        assert(v2 == 0, s"integer form $p*min>=$q*max dropped a pair at $t")
      }
    }
  }
}

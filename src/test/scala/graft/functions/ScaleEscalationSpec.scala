package graft.functions

import graft.SparkSpec
import graft.operators.CorpusQueries

/** The documented extreme-scale swaps (SCALE.md) as FORCED code paths:
  * a synthetic 1-byte threshold drives the escalated branch over the
  * real sf0.001 fixture and pins equivalence against the default branch
  * — exact for ScalableRank (the swap may flip implicitly), an rsd band
  * for Hll (the swap is an explicit opt-in because values change).
  */
class ScaleEscalationSpec extends SparkSpec {

  private val fixtureDir = "/root/testdata/sf0.001"

  private def withConf[A](key: String, value: String)(body: => A): A = {
    spark.conf.set(key, value)
    try body finally spark.conf.unset(key)
  }

  test("escalate() reads plan-estimated size against the conf'd " +
    "threshold (metadata only) and defaults per key") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i, s"v$i")).toDF("id", "v")
    // any non-empty frame has positive estimated bytes
    assert(Escalation.planBytes(df) > 0)
    assert(!Escalation.escalate(df, Escalation.RankEscalateBytesKey,
      Long.MaxValue))
    assert(Escalation.escalate(df, Escalation.RankEscalateBytesKey, 1L))
    // conf overrides the default in both directions
    withConf(Escalation.RankEscalateBytesKey, "1") {
      assert(Escalation.escalate(df, Escalation.RankEscalateBytesKey,
        Long.MaxValue))
    }
    withConf(Escalation.RankEscalateBytesKey, Long.MaxValue.toString) {
      assert(!Escalation.escalate(df, Escalation.RankEscalateBytesKey, 1L))
    }
    // distinct NEVER escalates unless conf'd (value-changing swap)
    assert(!Escalation.escalateDistinct(df))
    // a malformed threshold fails with the conf key named, not a bare
    // NumberFormatException from somewhere inside a query plan
    val e = withConf(Escalation.RankEscalateBytesKey, "lots") {
      intercept[IllegalArgumentException] {
        Escalation.escalate(df, Escalation.RankEscalateBytesKey, 1L)
      }
    }
    assert(e.getMessage.contains(Escalation.RankEscalateBytesKey))
  }

  test("q211: the ScalableRank branch emits EXACTLY the window branch's " +
    "rows, and actually runs bucketed (the __ib sub-bucket key)") {
    val exact = CorpusQueries.q211_vocab_growth(spark, fixtureDir)
    val exactRows = exact.collect().map(_.toSeq).toSeq
    assert(!exact.queryExecution.executedPlan.toString.contains("__ib"),
      "default branch must stay the plain window")
    withConf(Escalation.RankEscalateBytesKey, "1") {
      val esc = CorpusQueries.q211_vocab_growth(spark, fixtureDir)
      val escRows = esc.collect().map(_.toSeq).toSeq
      assert(escRows == exactRows,
        "ScalableRank escalation must be exact (same rows, same order)")
      assert(esc.queryExecution.executedPlan.toString.contains("__ib"),
        "escalated branch must rank through the id-range sub-buckets")
    }
  }

  test("q186: the Hll branch matches the exact tier's total_grams " +
    "exactly and its uniq_grams within the p=12 rsd band") {
    def byKey(rows: Array[org.apache.spark.sql.Row])
    : Map[(String, Long), (Long, Long)] =
      rows.map(r => (r.getString(0), r.getAs[Long]("n")) ->
        (r.getAs[Long]("total_grams"), r.getAs[Long]("uniq_grams"))).toMap
    val exact = byKey(
      CorpusQueries.q186_distinct_ngrams(spark, fixtureDir).collect())
    val esc = withConf(Escalation.DistinctEscalateBytesKey, "1") {
      byKey(CorpusQueries.q186_distinct_ngrams(spark, fixtureDir).collect())
    }
    assert(esc.keySet == exact.keySet)
    exact.foreach { case (k, (total, uniq)) =>
      val (escTotal, escUniq) = esc(k)
      assert(escTotal == total, s"$k: total_grams must stay exact")
      // 1.04/sqrt(4096) ~ 1.6% rsd; allow ~4 sigma plus small-count slack
      val tol = math.max(uniq * 0.065, 16.0)
      assert(math.abs(escUniq - uniq) <= tol,
        s"$k: Hll estimate $escUniq vs exact $uniq exceeds band ±$tol")
    }
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Asof.join]] vs DuckDB on handcrafted tie data. Expected tuples below
  * were produced by DuckDB 1.x on the same rows (both its native
  * `ASOF LEFT JOIN` and the deterministic LATERAL formulation agree):
  *
  *   trades(trade_id, sym, t, px):  (1,A,10) (2,A,20) (3,A,30)
  *                                  (4,B,15) (5,B,15) (6,C,5)
  *   quotes(quote_id, sym, t, bid): (101,A,10) (102,A,10) (103,A,25)
  *                                  (104,B,14) (105,B,16) (106,D,1)
  *
  * Covered: exact-timestamp tie left↔right (trade 1 vs quotes 101/102),
  * duplicate right timestamps (101 vs 102 → tie-break), duplicate left
  * timestamps (trades 4/5), unmatched key (C), right-only key (D).
  */
class AsofSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    (1L, "A", 10L, 100.0), (2L, "A", 20L, 101.0), (3L, "A", 30L, 102.0),
    (4L, "B", 15L, 50.0), (5L, "B", 15L, 51.0), (6L, "C", 5L, 7.0))
    .toDF("trade_id", "sym", "t", "px")

  private def quotes = Seq(
    (101L, "A", 10L, 99.5), (102L, "A", 10L, 99.7), (103L, "A", 25L, 100.9),
    (104L, "B", 14L, 49.9), (105L, "B", 16L, 50.2), (106L, "D", 1L, 1.0))
    .toDF("quote_id", "sym", "t", "bid")

  private def matches(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
    df.select(col("trade_id"), col("q_quote_id")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("backward inclusive matches DuckDB ASOF LEFT JOIN incl. tie-breaks") {
    val out = Asof.join(trades, quotes, on = Seq("sym"),
      leftAt = "t", rightAt = "t", rightPrefix = "q_",
      tieBreak = Seq("quote_id"))
    // full schema contract: all left cols + prefixed right payload cols
    assert(out.columns.toSeq ==
      Seq("trade_id", "sym", "t", "px", "q_quote_id", "q_t", "q_bid"))
    assert(matches(out) == Map(
      1L -> Some(102L),   // equal ts counts; tie among 101/102 → max id
      2L -> Some(102L), 3L -> Some(103L),
      4L -> Some(104L), 5L -> Some(104L),
      6L -> None))        // no quotes for sym C
    // payload travels with the match
    val bid1 = out.filter(col("trade_id") === 1).select("q_bid")
      .first().getDouble(0)
    assert(bid1 == 99.7)
  }

  test("strict (allowExactMatches=false) excludes equal-timestamp rights") {
    val out = Asof.join(trades, quotes, on = Seq("sym"),
      leftAt = "t", rightAt = "t", rightPrefix = "q_",
      tieBreak = Seq("quote_id"), allowExactMatches = false)
    assert(matches(out) == Map(
      1L -> None,         // quotes at t=10 no longer visible at t=10
      2L -> Some(102L), 3L -> Some(103L),
      4L -> Some(104L), 5L -> Some(104L), 6L -> None))
  }

  test("forward inclusive picks the earliest at-or-after right (min tie-break)") {
    val out = Asof.join(trades, quotes, on = Seq("sym"),
      leftAt = "t", rightAt = "t", rightPrefix = "q_",
      tieBreak = Seq("quote_id"), direction = "forward")
    assert(matches(out) == Map(
      1L -> Some(101L),   // ties forward → MIN quote_id
      2L -> Some(103L),
      3L -> None,         // nothing after t=30
      4L -> Some(105L), 5L -> Some(105L), 6L -> None))
  }

  test("null timestamps are unmatched on BOTH sides in BOTH directions") {
    // DuckDB ASOF and pandas merge_asof: a null ordering key never matches.
    // Regression (round-4 advice): forward ordered __at plain desc (NULLS
    // LAST), so a null-leftAt row sorted after every quote and picked up
    // the globally-earliest one.
    val tradesN = Seq(
      (1L, "A", Some(10L), 100.0), (7L, "A", None: Option[Long], 103.0))
      .toDF("trade_id", "sym", "t", "px")
    val quotesN = Seq(
      (101L, "A", Some(10L), 99.5), (107L, "A", None: Option[Long], 98.0))
      .toDF("quote_id", "sym", "t", "bid")
    Seq("backward", "forward").foreach { dir =>
      val out = Asof.join(tradesN, quotesN, on = Seq("sym"),
        leftAt = "t", rightAt = "t", rightPrefix = "q_",
        tieBreak = Seq("quote_id"), direction = dir)
      val m = matches(out)
      assert(m(7L).isEmpty, s"null left ts must not match ($dir): $m")
      // the null-ts QUOTE must never be anyone's match either
      assert(!m.values.flatten.exists(_ == 107L), s"null right ts matched ($dir): $m")
      assert(m(1L) == Some(101L), s"real ts still matches ($dir): $m")
    }
  }

  test("row count is exactly |left| — never inflates on duplicate timestamps") {
    val out = Asof.join(trades, quotes, on = Seq("sym"),
      leftAt = "t", rightAt = "t", tieBreak = Seq("quote_id"))
    assert(out.count() == trades.count())
  }

  test("plan is one shuffle + window: no join node, no cartesian") {
    val out = Asof.join(trades, quotes, on = Seq("sym"),
      leftAt = "t", rightAt = "t", tieBreak = Seq("quote_id"))
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"))
    assert(!physical.contains("SortMergeJoin"))
    assert(!physical.contains("BroadcastNestedLoopJoin"))
    assert(physical.contains("Window"))
  }
}

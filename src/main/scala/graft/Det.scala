package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers (SURVEY.md §7.2): every declared query must end in a
  * total order and round every double to a fixed scale so that the DuckDB
  * oracle hash-matches across engines (sums of doubles differ in final ulps
  * depending on accumulation order — rounding absorbs that).
  */
object Det {
  /** money-scale rounding (2 dp) */
  def r2(c: Column): Column = round(c, 2)
  /** ratio-scale rounding (4 dp) */
  def r4(c: Column): Column = round(c, 4)
  /** similarity/log-scale rounding (6 dp) */
  def r6(c: Column): Column = round(c, 6)

  /** double-precision dot product of two float vectors, accumulated
    * left-to-right (matches DuckDB list_dot_product on double-cast lists).
    * Backed by the codegen'd [[graft.expressions.DotProductD]] — the HOF
    * formulation (`aggregate(zip_with(...))`) computes the identical
    * double but materializes an intermediate array per row.
    */
  def dotD(a: Column, b: Column): Column =
    graft.expressions.DotProductD.dot(a, b)

  /** L2 norm of a float vector, in double precision. */
  def l2norm(v: Column): Column = sqrt(dotD(v, v))

  /** SQL fragment: exact floor division of integer expression `a` by
    * positive literal `b` — the q162/q168 pmod identity
    * `(a − pmod(a, b)) DIV b`. Spark's `div` truncates toward zero, so
    * bare `a div b` mis-buckets negative numerators (pre-epoch
    * timestamps, negative day deltas); subtracting the NONNEGATIVE
    * `pmod` first makes truncation equal floor at any sign and
    * magnitude. Use this for every epoch-day / epoch-week / delta
    * bucketing instead of bare `div`. NOTE on the oracle side: DuckDB's
    * `//` ALSO truncates toward zero (verified on 1.0.0: -5 // 3 = -1),
    * so a flooring call site here needs an explicitly-flooring oracle —
    * `date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))` for
    * epoch-day bucketing, or the mirrored identity
    * `(a - ((a % b) + b) % b) // b` for general operands (DuckDB `%`
    * matches Spark `%`, so the mirror is bit-exact at every sign).
    */
  def floorDivSql(a: String, b: String): String =
    s"((($a) - pmod(($a), $b)) div $b)"

  /** [[floorDivSql]] applied to the µs→epoch-day bucketing every
    * event-calendar query uses. */
  def epochDaySql(tsCol: String): String =
    floorDivSql(s"unix_micros($tsCol)", "86400000000")
}

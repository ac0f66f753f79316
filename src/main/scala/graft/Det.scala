package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers (SURVEY.md §7.2): every declared query must end in a
  * total order and round every double to a fixed scale so that the DuckDB
  * oracle hash-matches across engines (sums of doubles differ in final ulps
  * depending on accumulation order — rounding absorbs that).
  *
  * THE MONEY-SUM RULE (round-9 close-out, swept repo-wide in round 10):
  * rounding absorbs order-dependent ulps only while the true sum sits AWAY
  * from a rounding boundary. When an order-perturbed double sum lands
  * within an ulp of a half-cent, `r2` flips the last cent between engines —
  * observed at sf1 on q11 when the scan-split change reordered partial
  * sums. Therefore every `r2(sum(...))` over a money-scale column MUST
  * accumulate in decimal ([[sumMoney]]/[[sumMoneyOver]], oracle mirror
  * [[sumMoneySql]]): the inputs are exact 2-dp (FIXTURES.md pins every
  * money column), so the decimal cast is lossless, the decimal sum is
  * exact and order-independent, and the single cast of the exact total
  * back to double rounds the same rational on both engines. The ONLY
  * double sums allowed under `r2` are integral-valued columns
  * (l_quantity ∈ {1..50}): every partial sum is an exact integer far
  * below 2^53 (100 TB ≈ 6e11 rows × 50 < 2^45), so the double sum is
  * already exact at any accumulation order — each such site says so in
  * its scaladoc. Money AVERAGES divide the exact decimal numerator (cast
  * to double — one exact value on both engines) by the group count in ONE
  * double division, so no accumulation order survives into the quotient.
  * Double sums + rounding remain acceptable for ratio/log-scale outputs
  * (r4/r6 sites) where the nearest boundary is not semantically
  * meaningful.
  */
object Det {
  /** money-scale rounding (2 dp) */
  def r2(c: Column): Column = round(c, 2)

  /** Exact money sum (the money-sum rule above): lossless decimal(12,2)
    * cast of an exact-2-dp input, exact order-independent decimal
    * accumulation (Spark widens the sum to decimal(22,2) — no overflow
    * below 10^20 cents ≈ 10^6 × the 100 TB corpus total), one cast of the
    * exact total back to double. Wrap in [[r2]]; mirror with
    * [[sumMoneySql]].
    */
  def sumMoney(c: Column): Column =
    sum(c.cast("decimal(12,2)")).cast("double")

  /** [[sumMoney]] over a window frame (running/moving money sums). */
  def sumMoneyOver(c: Column,
      w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast("decimal(12,2)")).over(w).cast("double")

  /** [[sumMoney]]'s oracle-side mirror (DuckDB widens the sum to
    * decimal(38,2) — exact). Every cast is mirrored so both engines round
    * the identical rational to double. */
  def sumMoneySql(expr: String): String =
    s"CAST(sum(CAST($expr AS DECIMAL(12,2))) AS DOUBLE)"
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

  /** Embedding sanity gate for every similarity/assignment operator
    * (q82/q87/q98/q155/q158/q164/q200/q227): a vector participates iff
    * every component is finite with |x| ≤ 10 AND at least one component
    * is non-zero. The |x| ≤ 10 clause rejects NaN (the comparison is
    * false on both engines — Spark treats NaN comparisons as false,
    * DuckDB orders NaN greater than everything), ±Inf, and magnitudes
    * that would overflow the micro-unit BIGINT quantization
    * (|x| ≤ 10 ⇒ |round(x·10⁶)| ≤ 10⁷, squares ≤ 10¹⁴ — safe in 64-bit
    * moment sums far past fixture scale) as well as NULL components
    * (isNotNull — a vector with holes is as corrupt as one with NaNs,
    * and a NULL element poisons every dot product); the non-zero
    * clause rejects
    * the zero-norm vector, whose cosine is 0/0 (an ANSI DIVIDE_BY_ZERO
    * on Spark, NaN in DuckDB — a vector with no direction has no place
    * in a similarity op). Real normalized embeddings are ‖v‖ = 1 with
    * |x| < 1, so the gate is semantically inert on healthy corpora —
    * it exists so one corrupt export row degrades to "excluded and
    * countable via q197" instead of failing the whole job. q197 (the
    * health screen) deliberately does NOT apply it: it reports the bad
    * vectors per dimension instead.
    */
  def saneEmb(v: Column): Column =
    forall(v, x => x.isNotNull && abs(x) <= lit(10.0f)) &&
      exists(v, x => x =!= lit(0.0f))

  /** [[saneEmb]]'s oracle-side mirror (DuckDB list predicates over the
    * raw FLOAT list — same NaN/Inf/NULL verdicts, same zero test). The
    * explicit IS NULL clause matters on the oracle side: DuckDB's
    * list_filter drops NULL-predicate elements, so without it a vector
    * with NULL components would pass the gate and abort
    * list_inner_product ("can not contain NULL values"); Spark's
    * forall is NULL-poisoned into the same verdict but carries the
    * mirrored isNotNull for the same explicitness. */
  def saneEmbSql(col: String = "embedding"): String =
    s"(len(list_filter($col, x -> x IS NULL OR NOT (abs(x) <= 10))) = 0" +
      s" AND len(list_filter($col, x -> x <> 0)) > 0)"
}

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
    */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm of a float vector, in double precision. */
  def l2norm(v: Column): Column = sqrt(dotD(v, v))
}

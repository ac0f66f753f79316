package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles via a frequency histogram + crossing
  * rule — the scale-safe replacement for `percentile()`'s per-group
  * ObjectAggregation buffer (which holds a count map of EVERY distinct
  * value of a group inside ONE aggregation buffer on ONE executor; at
  * 100 TB one popular group is gigabytes of buffer → executor OOM).
  *
  * Shape: one two-phase HashAggregate builds counts per (group, value)
  * — spillable, map-side-combined, no object state — then the cumulative
  * window and the percentile selection run over the HISTOGRAM, whose
  * size is bounded by the value alphabet per group (cents-quantized
  * measures: tens of thousands of rows), not the corpus.
  *
  * Numeric parity: reproduces `org.apache.spark.sql.catalyst.expressions
  * .aggregate.Percentile.getPercentile` bit-for-bit —
  * rank `rk = (n-1)·p` in double; bracketing values selected by the
  * first cumulative count exceeding floor(rk) / ceil(rk); interpolation
  * `(ceil(rk)-rk)·v_lo + (rk-floor(rk))·v_hi` with the same two special
  * cases (integral rank; equal bracketing keys). Identical IEEE ops in
  * the same order ⇒ identical doubles ⇒ unchanged oracle hashes.
  */
object ExactPercentile {

  /** Percentiles from a prebuilt weighted histogram.
    *
    * @param hist     one row per (keys..., value) with a count column
    * @param keys     grouping columns (the histogram's group identity)
    * @param valueCol numeric value column (any numeric type; interpolation
    *                 happens in double, like Spark's `percentile`)
    * @param cntCol   BIGINT frequency column
    * @param ps       (percentile, output column name) pairs
    * @return one row per group: keys... followed by one double column per
    *         requested percentile (unrounded — callers apply Det rounding)
    */
  def fromHistogram(hist: DataFrame, keys: Seq[String], valueCol: String,
      cntCol: String, ps: Seq[(Double, String)]): DataFrame = {
    val keyCols = keys.map(col)
    val wCum = Window.partitionBy(keyCols: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(keyCols: _*)
    val h = hist
      .withColumn("__cum", sum(col(cntCol)).over(wCum))
      .withColumn("__n", sum(col(cntCol)).over(wTot))
    def rk: Column = (col("__n") - 1).cast("double")
    val aggs = ps.flatMap { case (p, alias) =>
      // first value whose cumulative count covers the bracketing index:
      // cum > idx  ⟺  cum ≥ idx+1 (cum integral) — Percentile's binary
      // search for `idx + 1` expressed as a conditional min.
      Seq(
        min(when(col("__cum") > floor(rk * lit(p)), col(valueCol)))
          .cast("double").as(s"__lo_$alias"),
        min(when(col("__cum") > ceil(rk * lit(p)), col(valueCol)))
          .cast("double").as(s"__hi_$alias"))
    } :+ max(col("__n")).as("__n")
    val grouped = h.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
    val withPs = ps.foldLeft(grouped) { case (acc, (p, alias)) =>
      val pos = (col("__n") - 1).cast("double") * lit(p)
      val lo = floor(pos)
      val hi = ceil(pos)
      val vLo = col(s"__lo_$alias")
      val vHi = col(s"__hi_$alias")
      acc.withColumn(alias,
        when(lo === hi, vLo)           // integral rank: no interpolation
          .when(vLo === vHi, vLo)      // bracketing keys equal: ditto
          .otherwise((hi - pos) * vLo + (pos - lo) * vHi))
    }
    withPs.drop(
      ps.flatMap { case (_, a) => Seq(s"__lo_$a", s"__hi_$a") } :+ "__n": _*)
  }

  /** Percentiles straight from row data: builds the (keys, value)
    * histogram with a two-phase count agg, then delegates. Null values are
    * ignored, matching `percentile()`.
    */
  def of(df: DataFrame, keys: Seq[String], valueCol: String,
      ps: Seq[(Double, String)]): DataFrame = {
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy((keys.map(col) :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("__cnt"))
    fromHistogram(hist, keys, valueCol, "__cnt", ps)
  }
}

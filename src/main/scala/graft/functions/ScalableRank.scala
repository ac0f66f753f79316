package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group row numbers under the (value, id) sort WITHOUT
  * group-cardinality-bound parallelism — the general form of the q33/q174
  * two-phase ranking, safe even under point-mass value distributions.
  *
  * The naive `row_number().over(partitionBy(group).orderBy(value, id))`
  * sorts a whole group in one task; fixed-width VALUE buckets (q33's
  * first cut) fix that for spread distributions but collapse back to one
  * task when 90% of a group shares a single value (point mass — dedup
  * counts, zero-inflated measures, default scores). This version keys
  * the corpus-sized window by (group, value, id-range bucket):
  *
  *  1. one spillable two-phase count histogram per (group, value, ib)
  *     where `ib = id DIV idBucketWidth` — ties split across id ranges;
  *  2. cumulative offsets over that BOUNDED histogram (value-alphabet ×
  *     occupied id-buckets rows per group — the ExactPercentile/q152
  *     bounded-frame discipline), ordered by (value, ib), which is
  *     consistent with the row order (value asc, id asc) because id
  *     ranges within one exact value are id-ordered by construction;
  *  3. `rn = offset + row_number` within (group, value, ib) — maximum
  *     task size ≈ idBucketWidth however skewed the values are.
  *
  * All arithmetic is integral: ranks are exact and layout-independent
  * (spec-pinned under 1/4/32 partitionings and a 90% point mass).
  *
  * @param df       input frame
  * @param groups   grouping columns
  * @param valueCol integral-typed sort value (quantize doubles to
  *                 cents/micros first — the §7.2 discipline)
  * @param idCol    integral unique tie-break id
  * @param idBucketWidth id-range width per sub-bucket (the max rows one
  *                 task sorts for a single value; default 4096)
  * @return input plus `rn` (1-based row number under (value, id) within
  *         the group) and `n` (group size)
  */
object ScalableRank {

  def rowNumbers(df: DataFrame, groups: Seq[String], valueCol: String,
                 idCol: String, idBucketWidth: Long = 4096L): DataFrame = {
    require(idBucketWidth > 0, "idBucketWidth must be positive")
    val g = groups.map(col)
    val d = df.withColumn("__ib",
      expr(s"$idCol DIV $idBucketWidth"))
    val counts = d.groupBy((g :+ col(valueCol) :+ col("__ib")): _*)
      .agg(count(lit(1)).as("__c"))
    val wOff = Window.partitionBy(g: _*)
      .orderBy(col(valueCol).asc, col("__ib").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(g: _*)
    val offs = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .withColumn("n", sum(col("__c")).over(wTot))
      .select((g :+ col(valueCol) :+ col("__ib") :+ col("__off") :+
        col("n")): _*)
    val wIn = Window
      .partitionBy((g :+ col(valueCol) :+ col("__ib")): _*)
      .orderBy(col(idCol).asc)
    d.join(offs, groups :+ valueCol :+ "__ib")
      .withColumn("rn", col("__off") + row_number().over(wIn))
      .drop("__ib", "__off")
  }
}

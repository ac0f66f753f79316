package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** General as-of join between two arbitrary tables: for each left row, the
  * single right row in the same `on` group whose `rightAt` is the nearest
  * at-or-before (backward) / at-or-after (forward) the left row's `leftAt`.
  * Unmatched left rows keep nulls in the right-side columns (left-outer
  * semantics, like DuckDB's `ASOF LEFT JOIN` / pandas `merge_asof`).
  *
  * Formulation (the q16 shape generalized): tag both inputs, union them on
  * the shared (keys, at) spine, sort each key group once by
  * (at, side-tag, tieBreak*), and carry the latest right-side payload with
  * `last(_, ignoreNulls)` over an unbounded-preceding row frame; finally
  * keep only left rows and unpack the carried struct.
  *
  * Why not a range join: a `l.at >= r.at` join predicate explodes to the
  * full per-key cross product before aggregation (quadratic in key group
  * size — fatal for hot keys at 100 TB). This plan is ONE shuffle on the
  * `on` keys and a per-key sort, O(n log n) with per-row O(1) window state
  * — the same partitioning a time-ordered pipeline already has, so the
  * exchange often elides entirely on pre-bucketed layouts.
  *
  * Determinism: when several right rows share the match timestamp, the
  * winner is the greatest (backward) / least (forward) by `tieBreak`; pass
  * a unique right-side column there (else the pick among exact duplicates
  * is plan-dependent, which only matters if payloads differ).
  */
object Asof {

  /** @param on     equi-join key columns present in BOTH inputs
    * @param leftAt ordering column on the left (same data type as rightAt)
    * @param rightAt ordering column on the right
    * @param rightPrefix prepended to right-side output columns (collision
    *                    guard; right `on` keys are not re-emitted)
    * @param tieBreak right-side columns ordering equal-`rightAt` rows
    * @param allowExactMatches backward: match rightAt <= leftAt (true) or
    *                          strictly < (false); mirrored for forward
    * @param direction "backward" (default) or "forward"
    */
  def join(left: DataFrame, right: DataFrame, on: Seq[String],
           leftAt: String, rightAt: String, rightPrefix: String = "right_",
           tieBreak: Seq[String] = Nil, allowExactMatches: Boolean = true,
           direction: String = "backward"): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equi key")
    require(direction == "backward" || direction == "forward",
      s"unknown direction: $direction")
    val backward = direction == "backward"
    require(left.schema(leftAt).dataType == right.schema(rightAt).dataType,
      "leftAt and rightAt must have the same data type")

    val leftCols = left.columns.toSeq
    val payloadCols = right.columns.toSeq.filterNot(on.contains)
    val lStructT = StructType(leftCols.map(left.schema(_)))
    val rStructT = StructType(payloadCols.map(right.schema(_)))

    // at equal timestamps the right row must sort BEFORE the left row for
    // an inclusive match (so the window sees it), AFTER for a strict one
    val (lTag, rTag) = if (allowExactMatches) (1, 0) else (0, 1)
    val lSide = left.select(
      on.map(col) ++
        Seq(col(leftAt).as("__at"), lit(lTag).as("__tag")) ++
        tieBreak.zipWithIndex.map { case (c, i) =>
          lit(null).cast(right.schema(c).dataType).as(s"__tb$i") } ++
        Seq(struct(leftCols.map(col): _*).as("__lrow"),
          lit(null).cast(rStructT).as("__rrow")): _*)
    val rSide = right.filter(col(rightAt).isNotNull).select(
      on.map(col) ++
        Seq(col(rightAt).as("__at"), lit(rTag).as("__tag")) ++
        tieBreak.zipWithIndex.map { case (c, i) => col(c).as(s"__tb$i") } ++
        Seq(lit(null).cast(lStructT).as("__lrow"),
          struct(payloadCols.map(col): _*).as("__rrow")): _*)

    // backward scans time ascending (carry the latest earlier right row);
    // forward scans descending (carry the earliest later one). Tags always
    // sort ascending; tie-breaks follow the scan so "last" = the winner.
    // Null timestamps must be unmatchable on both sides (DuckDB ASOF /
    // pandas merge_asof semantics): null-at LEFT rows are pinned BEFORE
    // every right row in scan order (nulls_first in both directions) so
    // their window holds no right payload; null-at RIGHT rows are dropped
    // outright below (they precede everything too and would otherwise be
    // carried into every left row's frame).
    val ordering =
      (if (backward) Seq(col("__at").asc_nulls_first)
       else Seq(col("__at").desc_nulls_first)) ++
        Seq(col("__tag").asc) ++
        tieBreak.indices.map(i =>
          if (backward) col(s"__tb$i").asc else col(s"__tb$i").desc)
    val w = Window.partitionBy(on.map(col): _*).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSide.unionByName(rSide)
      .withColumn("__match", last(col("__rrow"), ignoreNulls = true).over(w))
      .filter(col("__tag") === lTag && col("__lrow").isNotNull)
      .select(leftCols.map(c => col("__lrow").getField(c).as(c)) ++
        payloadCols.map(c =>
          col("__match").getField(c).as(rightPrefix + c)): _*)
  }
}

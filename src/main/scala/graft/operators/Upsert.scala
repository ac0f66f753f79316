package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE/upsert over plain parquet frames — the CDC-apply step (no Delta/
  * Iceberg table format in this stack, so the merge is expressed as a
  * declarative plan):
  *
  *  - `apply`: updates win over base rows on key collision, new keys
  *    append — ONE shuffle on the key via a union + per-key priority
  *    window (no join at all: the same union-beats-join trade as
  *    [[Asof.join]], and it degrades gracefully on skewed keys where an
  *    outer join's hot rows concentrate).
  *  - `applyCdc`: same, but updates carry an `op` column ('u' upsert /
  *    'd' delete) and deletes drop the key entirely — the full
  *    change-data-capture apply.
  *
  * Determinism: if `updates` itself carries duplicate keys the caller
  * must pass `versionCol` (highest version wins); without it the pick
  * among colliding update rows is plan-dependent.
  *
  * At 100 TB: base is the bucketed/partitioned snapshot, updates the
  * (much smaller) day's changes; the union plan shuffles each side once
  * on the key — on a layout pre-bucketed by the key the base side's
  * exchange elides entirely (see the bucketed-layout PlanShapeSpec).
  */
object Upsert {

  def apply(base: DataFrame, updates: DataFrame, keys: Seq[String],
            versionCol: Option[String] = None): DataFrame =
    merged(base, updates.withColumn("__op", lit("u")), keys, versionCol)

  /** updates rows carry `opCol`: "u"/"U" upserts, "d"/"D" deletes the key */
  def applyCdc(base: DataFrame, updates: DataFrame, keys: Seq[String],
               opCol: String, versionCol: Option[String] = None): DataFrame =
    merged(base,
      updates.withColumn("__op", lower(col(opCol))).drop(opCol),
      keys, versionCol)

  private def merged(base: DataFrame, tagged: DataFrame, keys: Seq[String],
                     versionCol: Option[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val dataCols = base.columns.toSeq
    val lhs = base.select(dataCols.map(col): _*)
      .withColumn("__op", lit("b")).withColumn("__prio", lit(0))
    val rhs = tagged.select((dataCols.map(col) :+ col("__op")): _*)
      .withColumn("__prio", lit(1))
    val ordering = (col("__prio").desc +:
      versionCol.toSeq.map(v => col(v).desc)) :+ col("__op").asc
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    lhs.unionByName(rhs)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("__op") =!= "d")
      .select(dataCols.map(col): _*)
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DIMSUM-sampled all-pairs item-item cosine over a binary incidence
  * ("basket") relation — the FULL-matrix companion to q160's query-driven
  * scoring, which documents the n² similarity matrix as out of its scope.
  *
  * Algorithm (Zadeh & Goel, "Dimension Independent Similarity Computation",
  * 2013; the sampling scheme behind Spark MLlib's
  * `RowMatrix.columnSimilarities(threshold)`): keep each (row, item)
  * incidence with probability q_i = min(1, √γ / ‖c_i‖) (binary incidence ⇒
  * ‖c_i‖ = √freq_i), scale kept entries by 1/q_i, and sum sampled
  * products. Popular items — whose per-row contribution to their own
  * cosine is tiny — are aggressively downsampled, so expected shuffle
  * volume is O(rows · γ)-ish and INDEPENDENT of item skew: the hot-column
  * blowup that makes the naive all-pairs join quadratic never happens.
  * Items with ‖c_i‖ ≤ √γ are kept exactly (q = 1), so rare-item
  * similarities — the ones a recommender actually ranks by — are exact;
  * γ is the accuracy↔cost knob (γ ≥ max freq ⇒ the whole matrix is
  * exact).
  *
  * Determinism discipline (§7.2): the sampling coin is a pure xxhash64
  * function of (salt, row, item) — layout-, retry-, and
  * partitioning-independent. And because the DIMSUM weight 1/q_i is
  * CONSTANT PER ITEM, the estimator factors as n_ab · (1/q_a) · (1/q_b)
  * with n_ab an exact integer pair count — the float arithmetic is one
  * expression per output pair, never an order-dependent running sum, so
  * results are bit-identical under any partition layout (DimsumSpec pins
  * 1/4/32).
  */
object Dimsum {

  /** Deterministic unit-interval coin for (row, item). */
  private def coin(row: Column, item: Column, salt: Int): Column =
    pmod(xxhash64(lit(salt), row, item), lit(1000000000L)).cast("double") / 1e9

  /** Estimated cosine for every co-occurring item pair.
    *
    * @param baskets relation with one row per (basket, item) incidence
    *                (duplicates are collapsed)
    * @param rowCol  basket/row identifier column
    * @param itemCol item identifier column
    * @param gamma   oversampling parameter γ: items with freq ≤ γ are
    *                exact; raise for accuracy, lower for cost
    * @return (item_a, item_b, n_sampled, sim_est) with item_a < item_b,
    *         one row per pair that co-occurred in ≥1 sampled basket
    */
  def itemCosine(baskets: DataFrame, rowCol: String, itemCol: String,
      gamma: Double, salt: Int = 0xD155): DataFrame = {
    val inc = baskets
      .select(col(rowCol).as("r"), col(itemCol).as("i")).distinct()
    val freq = inc.groupBy(col("i")).agg(count(lit(1)).as("f"))
    val probs = freq.withColumn("q",
      least(lit(1.0), lit(math.sqrt(gamma)) / sqrt(col("f").cast("double"))))
    val kept = inc.join(probs, "i")
      .filter(coin(col("r"), col("i"), salt) < col("q"))
    val ka = kept.select(col("r"), col("i").as("item_a"),
      col("q").as("qa"), col("f").as("fa"))
    val kb = kept.select(col("r"), col("i").as("item_b"),
      col("q").as("qb"), col("f").as("fb"))
    ka.join(kb, "r")
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"),
        col("qa"), col("qb"), col("fa"), col("fb"))
      .agg(count(lit(1)).as("n_sampled"))
      // one float expression per pair over exact integers and per-item
      // constants — no running double sum anywhere
      .withColumn("sim_est",
        col("n_sampled").cast("double") / (col("qa") * col("qb") *
          sqrt(col("fa").cast("double") * col("fb").cast("double"))))
      .select(col("item_a"), col("item_b"), col("n_sampled"), col("sim_est"))
  }

  /** Exact cosine ground truth (the q160 formula over ALL pairs) — the
    * oracle the spec measures sampling error against. Quadratic in basket
    * width; fixture-tier only.
    */
  def exactCosine(baskets: DataFrame, rowCol: String,
      itemCol: String): DataFrame = {
    val inc = baskets
      .select(col(rowCol).as("r"), col(itemCol).as("i")).distinct()
    val freq = inc.groupBy(col("i")).agg(count(lit(1)).as("f"))
    val a = inc.select(col("r"), col("i").as("item_a"))
    val b = inc.select(col("r"), col("i").as("item_b"))
    a.join(b, "r").filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("cooc"))
      .join(freq.select(col("i").as("item_a"), col("f").as("fa")), "item_a")
      .join(freq.select(col("i").as("item_b"), col("f").as("fb")), "item_b")
      .withColumn("sim",
        col("cooc").cast("double") /
          sqrt(col("fa").cast("double") * col("fb").cast("double")))
      .select(col("item_a"), col("item_b"), col("cooc"), col("sim"))
  }
}

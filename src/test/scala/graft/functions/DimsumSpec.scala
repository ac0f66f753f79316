package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** DIMSUM sampled item similarity vs the exact all-pairs cosine (the
  * q160-formula ground truth — the q81→q94 oracle-vs-scale-tier pattern,
  * third instance): exactness when γ covers the frequency range, bounded
  * error + high recall under real sampling, hot-item downsampling, and
  * byte-identical results under 1/4/32 partition layouts.
  */
class DimsumSpec extends SparkSpec {

  private lazy val baskets = Tables.lineitem(spark, sfDir)
    .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))

  private def asMap(df: org.apache.spark.sql.DataFrame, simCol: String) =
    df.collect().map(r => ((r.getLong(0), r.getLong(1)),
      r.getAs[Double](simCol))).toMap

  test("gamma >= max frequency reproduces the exact cosine bit-for-bit") {
    // fixture freqs are 17..47; γ=64 ⇒ every q_i = 1, nothing sampled out
    val exact = asMap(Dimsum.exactCosine(baskets, "o", "p"), "sim")
    val est = asMap(Dimsum.itemCosine(baskets, "o", "p", gamma = 64.0), "sim_est")
    assert(est.size == exact.size)
    exact.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(est(k)) ==
        java.lang.Double.doubleToLongBits(v), s"pair $k")
    }
  }

  test("gamma=25 samples (strictly fewer pairs) yet keeps recall >= 0.95 " +
    "and MSE <= 0.005 on pairs with exact sim >= 0.1") {
    val exact = asMap(Dimsum.exactCosine(baskets, "o", "p"), "sim")
    val est = asMap(Dimsum.itemCosine(baskets, "o", "p", gamma = 25.0), "sim_est")
    assert(est.size < exact.size, "sampling did not drop anything — " +
      "calibration broken, the test proves nothing")
    val hot = exact.filter(_._2 >= 0.1).keySet
    assert(hot.nonEmpty)
    val recall = hot.count(est.contains).toDouble / hot.size
    assert(recall >= 0.95, s"recall=$recall")
    val sqErrs = hot.toSeq.flatMap(k => est.get(k).map(e =>
      math.pow(e - exact(k), 2)))
    val mse = sqErrs.sum / sqErrs.size
    assert(mse <= 0.005, s"mse=$mse")
  }

  test("hot items are downsampled: a 500-basket item contributes O(sqrt) " +
    "sampled pairs, and a planted perfect pair survives") {
    import spark.implicits._
    // item 1 in every basket (freq 500), items 1000+k unique per basket
    // (freq 1, never sampled out), plus a planted near-duplicate pair
    // (2, 3) co-occurring in 30 baskets
    val rows =
      (1L to 500L).flatMap(k => Seq((k, 1L), (k, 1000L + k))) ++
        (1L to 30L).flatMap(k => Seq((k, 2L), (k, 3L)))
    val df = rows.toDF("o", "p")
    val est = Dimsum.itemCosine(df, "o", "p", gamma = 4.0)
    // kept incidences of the hot item = Σ n_sampled over its (1, u_k)
    // pairs; E = √γ·√f = 2·√500 ≈ 45 — assert far below the full 500
    val hotKept = est.filter(col("item_a") === 1L || col("item_b") === 1L)
      .agg(sum(col("n_sampled"))).collect().head.getLong(0)
    assert(hotKept > 10L && hotKept < 150L,
      s"hot item kept $hotKept of 500 incidences (expected ~45)")
    // the planted pair (freq 30 each, exact sim 1.0) stays detectable:
    // q = √4/√30 ⇒ E[n] = 30·q² = 4; estimate unbiased around 1.0
    val planted = est.filter(col("item_a") === 2L && col("item_b") === 3L)
      .collect()
    assert(planted.nonEmpty, "planted duplicate pair sampled away")
    val sim = planted.head.getAs[Double]("sim_est")
    assert(sim > 0.5 && sim < 2.0, s"planted pair estimate $sim")
  }

  test("results are identical under 1/4/32 partition layouts") {
    val layouts = Seq(1, 4, 32).map { n =>
      Dimsum.itemCosine(baskets.repartition(n), "o", "p", gamma = 16.0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    }
    assert(layouts(0) == layouts(1) && layouts(1) == layouts(2))
  }
}

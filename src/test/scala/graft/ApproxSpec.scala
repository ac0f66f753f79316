package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates (SURVEY §2.3): engine-specific sketches can't
  * hash-match an oracle, so the contract is an error bound vs exact.
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct is within rsd of the exact count") {
    val orders = Tables.orders(spark, sfDir)
    val exact = orders.select(countDistinct("o_custkey")).head.getLong(0)
    val approx = orders.select(approx_count_distinct("o_custkey", 0.02))
      .head.getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.06, s"exact=$exact approx=$approx err=$err") // 3×rsd
  }

  test("approx_count_distinct on high-cardinality key") {
    val li = Tables.lineitem(spark, sfDir)
    val exact = li.select(countDistinct("l_orderkey")).head.getLong(0)
    val approx = li.select(approx_count_distinct("l_orderkey", 0.05))
      .head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.15)
  }

  test("approx_percentile brackets the exact median") {
    val ev = Tables.events(spark, sfDir)
    val apx = ev.select(percentile_approx(col("value"), lit(0.5), lit(10000)))
      .head.getDouble(0)
    val exact = ev.select(median(col("value"))).head.getDouble(0)
    assert(math.abs(apx - exact) / exact < 0.05, s"apx=$apx exact=$exact")
  }

  test("mergeable HLL sketches: per-shard sketch + union == whole-corpus " +
    "estimate (the 100 TB distinct-count deployment shape)") {
    // at scale, distinct counts run as per-shard sketches merged centrally
    // — never a global exact shuffle. DataSketches HLL is mergeable by
    // construction: union of shard sketches must equal the direct sketch.
    val li = Tables.lineitem(spark, sfDir)
    val direct = li.select(hll_sketch_estimate(
        hll_sketch_agg(col("l_orderkey"))).as("n"))
      .head.getLong(0)
    val merged = li
      .withColumn("shard", pmod(col("l_orderkey"), lit(16)))
      .groupBy("shard")
      .agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
      .select(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n"))
      .head.getLong(0)
    // the union gadget re-coerces register arrays, so merged vs direct is
    // near- but not bit-equal — pin a tight relative bound instead
    val drift = math.abs(merged - direct).toDouble / direct
    assert(drift < 0.01, s"sketch-merge drifted from direct: $merged vs $direct")
    val exact = li.select(countDistinct("l_orderkey")).head.getLong(0)
    val err = math.abs(merged - exact).toDouble / exact
    assert(err < 0.05, s"HLL estimate off by $err")
  }
}

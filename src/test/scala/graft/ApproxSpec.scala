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
}

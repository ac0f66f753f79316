package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {

  test("recommended confs scale shuffle partitions with cores and keep AQE on") {
    val c = GraftSession.recommendedConfs(totalCores = 800)
    assert(c("spark.sql.shuffle.partitions") == "1600")
    assert(c("spark.sql.adaptive.enabled") == "true")
    assert(c("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(c("spark.sql.session.timeZone") == "UTC")
    assert(c("spark.sql.extensions") == "graft.plans.GraftExtensions")
  }

  test("builder applies the profile; extensions make graft SQL functions available") {
    // reuse the shared test session's JVM: build a session from the same
    // builder path (getOrCreate returns the active one with confs checked
    // via the extension registration below)
    val spark = SparkSpec.session
    graft.plans.GraftExtensions.register(spark)
    val n = spark.sql(
      "SELECT sorted_intersect_size(array(1L, 2L), array(2L, 3L)) AS n")
      .head().getInt(0)
    assert(n == 1)
    val wb = spark.sql(
      "SELECT within_box(21.3, -157.8, 21.8, -158.4, 21.2, -157.5) AS b")
      .head().getBoolean(0)
    assert(wb)
  }
}

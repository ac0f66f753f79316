package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic bottom-k sampling: equivalence to driver-side reference
  * selections, the shard-merge property (per-part bottom-ks concatenate to
  * the exact global sample), layout invariance, and weight-proportional
  * inclusion on a measurable fixture.
  */
class ReservoirSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = spark.range(1000L)
    .select(col("id"), concat(lit("doc"), col("id")).as("key"),
      (col("id") % 10 + 1).cast("double").as("w"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("uniform(k) equals the k smallest md5(key) computed driver-side") {
    val got = Reservoir.uniform(rows, col("key"), 25)
      .select(col("key")).as[String].collect().toSet
    val want = rows.select(col("key")).as[String].collect()
      .sortBy(k => (md5hex(k).take(16), k)).take(25).toSet
    assert(got == want)
  }

  test("weighted(k) equals the k smallest A-ES draws computed driver-side") {
    val got = Reservoir.weighted(rows, col("key"), col("w"), 25)
      .select(col("key")).as[String].collect().toSet
    val local = rows.select(col("key"), col("w")).as[(String, Double)]
      .collect()
    val want = local.sortBy { case (k, w) =>
      (Reservoir.referenceDraw(k, w), k)
    }.take(25).map(_._1).toSet
    assert(got == want)
  }

  test("shard-merge: bottom-k of concatenated per-part bottom-ks equals " +
    "the global bottom-k (uniform and weighted)") {
    val parts = Seq(
      rows.filter(col("id") < 300L),
      rows.filter(col("id") >= 300L && col("id") < 700L),
      rows.filter(col("id") >= 700L))
    val k = 20
    val uniGlobal = Reservoir.uniform(rows, col("key"), k)
      .select("key").as[String].collect().toSet
    val uniMerged = Reservoir.uniform(
      parts.map(Reservoir.uniform(_, col("key"), k)).reduce(_ union _),
      col("key"), k).select("key").as[String].collect().toSet
    assert(uniMerged == uniGlobal)
    val wGlobal = Reservoir.weighted(rows, col("key"), col("w"), k)
      .select("key").as[String].collect().toSet
    val wMerged = Reservoir.weighted(
      parts.map(Reservoir.weighted(_, col("key"), col("w"), k))
        .reduce(_ union _),
      col("key"), col("w"), k).select("key").as[String].collect().toSet
    assert(wMerged == wGlobal)
  }

  test("sample is identical under 1/4/32 partition layouts") {
    for (n <- Seq(1, 4, 32)) {
      val got = Reservoir.weighted(rows.repartition(n), col("key"),
        col("w"), 30).select("key").as[String].collect().toSet
      val ref = Reservoir.weighted(rows.repartition(2), col("key"),
        col("w"), 30).select("key").as[String].collect().toSet
      assert(got == ref, s"layout $n")
    }
  }

  test("inclusion scales with weight: the weight-10 decile appears far " +
    "more often than the weight-1 decile in a k=200 sample") {
    val sample = Reservoir.weighted(rows, col("key"), col("w"), 200)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    // expected inclusion ratio 10:1 on 100-row deciles; deterministic
    // fixture, generous band
    assert(sample.getOrElse(10.0, 0L) >= 3L * sample.getOrElse(1.0, 1L).max(1L),
      s"per-weight counts: $sample")
    // all-equal weights degenerate to a uniform selection of k
    val eq = Reservoir.weighted(rows, col("key"), lit(1.0), 50)
    assert(eq.count() == 50L)
  }

  test("keeps every row when k >= input size; original columns survive") {
    val small = rows.filter(col("id") < 7L)
    val out = Reservoir.uniform(small, col("key"), 100)
    assert(out.count() == 7L)
    assert(out.columns.toSeq == Seq("id", "key", "w"))
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TDigestSpec extends SparkSpec {
  import spark.implicits._

  private val Q = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  private def digestOf(xs: Seq[Double], parts: Int, delta: Double): TDigest =
    xs.toDF("x").repartition(parts)
      .agg(TDigestAgg.sketch(col("x"), delta).as("d"))
      .select("d.*").as[TDigest].head()

  /** |empirical rank of the estimate − q| on the sorted sample */
  private def rankErr(sorted: Array[Double], est: Double, q: Double): Double = {
    val below = sorted.count(_ <= est).toDouble
    math.abs(below / sorted.length - q)
  }

  test("rank error stays small on uniform data under any partition layout") {
    val rnd = new scala.util.Random(3)
    val xs = Array.fill(10000)(rnd.nextDouble() * 1000.0)
    val sorted = xs.sorted
    for (parts <- Seq(1, 4, 32); q <- Q) {
      val d = digestOf(xs.toSeq, parts, 100.0)
      assert(rankErr(sorted, d.quantile(q), q) <= 0.03,
        s"parts=$parts q=$q")
    }
  }

  test("tails are sharper than the middle on heavy-tailed data") {
    val rnd = new scala.util.Random(9)
    val xs = Array.fill(20000)(math.exp(rnd.nextGaussian() * 2.0))
    val sorted = xs.sorted
    val d = digestOf(xs.toSeq, 8, 100.0)
    assert(rankErr(sorted, d.quantile(0.999), 0.999) <= 0.005)
    assert(rankErr(sorted, d.quantile(0.001), 0.001) <= 0.005)
    assert(rankErr(sorted, d.quantile(0.5), 0.5) <= 0.03)
  }

  test("mass, extremes, and size bound hold under every layout") {
    val rnd = new scala.util.Random(5)
    val xs = Seq.fill(5000)(rnd.nextGaussian())
    for (parts <- Seq(1, 4, 32)) {
      val d = digestOf(xs, parts, 100.0)
      assert(d.count == 5000L)
      assert(d.centroids.map(_._2).sum == 5000L)
      assert(d.min == xs.min && d.max == xs.max)
      assert(d.centroids.length <= 200, s"centroids=${d.centroids.length}")
      assert(d.quantile(0.0) == xs.min && d.quantile(1.0) == xs.max)
    }
  }

  test("quantile function is monotone in q") {
    val rnd = new scala.util.Random(13)
    val d = digestOf(Seq.fill(3000)(rnd.nextDouble()), 4, 50.0)
    val qs = (0 to 100).map(_ / 100.0)
    val vals = qs.map(d.quantile)
    assert(vals.zip(vals.tail).forall { case (a, b) => a <= b })
  }

  test("grouped sketches: per-key digests are independent and sized to the key") {
    val rows = (1 to 2000).map(i => (i % 2, i.toDouble))
    val ds = rows.toDF("k", "x").repartition(8)
      .groupBy("k").agg(TDigestAgg.sketch(col("x"), 50.0).as("d"))
      .select("k", "d").as[(Int, TDigest)].collect().toMap
    assert(ds(0).count == 1000L && ds(1).count == 1000L)
    // evens in key 0, odds in key 1 — medians land near 1000
    assert(math.abs(ds(0).quantile(0.5) - 1000.0) <= 30.0)
    assert(math.abs(ds(1).quantile(0.5) - 1000.0) <= 30.0)
    assert(ds(0).min == 2.0 && ds(1).min == 1.0)
  }

  test("single value and empty-group behavior") {
    val d = digestOf(Seq(42.0), 1, 100.0)
    assert(d.count == 1L && d.quantile(0.5) == 42.0)
    intercept[IllegalArgumentException] {
      TDigest(100.0, Nil, Double.PositiveInfinity, Double.NegativeInfinity, 0L)
        .quantile(0.5)
    }
  }

  test("nullable input: nulls are skipped, not crashed on (the " +
    "percentile_approx contract)") {
    import spark.implicits._
    val d = Seq[java.lang.Double](1.0, null, 2.0, null, 3.0)
      .toDF("x").repartition(3)
      .agg(TDigestAgg.sketch(col("x"), 100.0).as("d"))
      .as[Tuple1[TDigest]].head()._1
    assert(d.count == 3L && d.min == 1.0 && d.max == 3.0)
    assert(d.quantile(0.5) == 2.0)
  }
}

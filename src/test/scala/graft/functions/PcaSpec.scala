package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Exact-moment PCA: planted-direction recovery, eigenpair residuals,
  * BIT-identical models under 1/4/32 partition layouts (the sketch-tier
  * layout-independence discipline applied to model fitting), unit
  * variance after whitening, and the fixture-embeddings path.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** 400 vectors with a planted dominant direction u (sd 3), a second
    * direction w (sd 1.2), and isotropic noise (sd 0.1) — deterministic
    * seed, no wall-clock anywhere.
    */
  private lazy val planted: Seq[Seq[Float]] = {
    val rnd = new java.util.Random(42)
    val u = Array(0.6, 0.6, 0.3, 0.3, 0.2, 0.2, 0.1, 0.1)
    val un = math.sqrt(u.map(x => x * x).sum); val uu = u.map(_ / un)
    // w: orthogonal to u by construction (Gram-Schmidt on a basis vector)
    val w0 = Array(1.0, -1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val d0 = w0.zip(uu).map { case (a, b) => a - b * w0.zip(uu).map {
      case (x, y) => x * y }.sum }
    val wn = math.sqrt(d0.map(x => x * x).sum); val ww = d0.map(_ / wn)
    (0 until 400).map { _ =>
      val a = rnd.nextGaussian() * 3.0
      val b = rnd.nextGaussian() * 1.2
      (0 until dim).map { i =>
        (a * uu(i) + b * ww(i) + rnd.nextGaussian() * 0.1).toFloat
      }
    }
  }

  private lazy val plantedU: Array[Double] = {
    val u = Array(0.6, 0.6, 0.3, 0.3, 0.2, 0.2, 0.1, 0.1)
    val un = math.sqrt(u.map(x => x * x).sum); u.map(_ / un)
  }

  test("top component recovers the planted dominant direction; " +
    "eigvals descend; components are orthonormal") {
    val df = planted.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "vec")
    val m = Pca.fit(df, "vec", dim, k = 3)
    val cos = m.components(0).zip(plantedU).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.99, s"top component off: cos=$cos")
    assert(m.eigvals(0) > m.eigvals(1) && m.eigvals(1) > m.eigvals(2))
    assert(m.eigvals(0) > 8.0 && m.eigvals(0) < 10.0, m.eigvals(0)) // ~3²
    for (i <- 0 until 3; j <- 0 until 3) {
      val dot = m.components(i).zip(m.components(j))
        .map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-6, s"<$i,$j> = $dot")
    }
  }

  test("eigenpairs satisfy Cov v = lambda v on an independently " +
    "computed covariance") {
    val df = planted.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "vec")
    val m = Pca.fit(df, "vec", dim, k = 2)
    // independent double-precision covariance (quantized like the fit)
    val q = planted.map(_.map(x => math.round(x.toDouble * 1e6) / 1e6))
    val n = q.length
    val mean = (0 until dim).map(i => q.map(_(i)).sum / n)
    def cov(i: Int, j: Int): Double =
      q.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
    for (k <- 0 until 2) {
      val v = m.components(k)
      val cv = (0 until dim).map(i =>
        (0 until dim).map(j => cov(i, j) * v(j)).sum)
      val resid = math.sqrt(cv.zip(v).map { case (a, b) =>
        val d = a - m.eigvals(k) * b; d * d }.sum)
      assert(resid < 1e-6 * m.eigvals(k), s"component $k residual $resid")
    }
  }

  test("the fitted model is BIT-identical under 1/4/32 partition layouts") {
    val df = planted.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "vec")
    val ms = Seq(1, 4, 32).map(p =>
      Pca.fit(df.repartition(p, col("id")), "vec", dim, k = 3))
    for (m <- ms.tail) {
      assert(m.n == ms.head.n)
      assert(m.mean.sameElements(ms.head.mean))
      assert(m.eigvals.sameElements(ms.head.eigvals))
      m.components.zip(ms.head.components).foreach { case (a, b) =>
        assert(a.sameElements(b))
      }
    }
  }

  test("whitened coordinates have zero mean and unit variance") {
    val df = planted.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "vec")
    val m = Pca.fit(df, "vec", dim, k = 2)
    val rows = Pca.whiten(df, "vec", m).select(col("white"))
      .collect().map(_.getSeq[Double](0))
    for (j <- 0 until 2) {
      val xs = rows.map(_(j))
      val mu = xs.sum / xs.length
      val va = xs.map(x => (x - mu) * (x - mu)).sum / xs.length
      assert(math.abs(mu) < 0.05, s"coord $j mean $mu")
      assert(math.abs(va - 1.0) < 0.05, s"coord $j variance $va")
    }
  }

  test("fixture embeddings: fit + whiten runs distributed and whitened " +
    "variances are unit") {
    val emb = Tables.embeddings(spark, sfDir)
    val m = Pca.fit(emb, "embedding", dim = 64, k = 4)
    assert(m.n == emb.count())
    val rows = Pca.whiten(emb, "embedding", m).select(col("white"))
      .collect().map(_.getSeq[Double](0))
    for (j <- 0 until 4) {
      val xs = rows.map(_(j))
      val mu = xs.sum / xs.length
      val va = xs.map(x => (x - mu) * (x - mu)).sum / xs.length
      assert(math.abs(mu) < 0.05 && math.abs(va - 1.0) < 0.1,
        s"coord $j mean $mu var $va")
    }
    // whitening is a codegen'd projection — no UDF in the plan
    val plan = Pca.whiten(emb, "embedding", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      plan.take(1000))
  }
}

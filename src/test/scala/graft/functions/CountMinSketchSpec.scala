package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSketchSpec extends SparkSpec {

  import spark.implicits._

  // zipfy fixture: key_i appears ~1000/i times — heavy head, long tail
  private val items: Seq[String] =
    (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"key_$i"))
  private val truth: Map[String, Long] =
    items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private val (d, w) = CountMinSketch.sizing(eps = 0.005, delta = 0.01)

  private def build(df: org.apache.spark.sql.DataFrame): Array[Long] =
    df.agg(CountMinSketch.sketch(col("key"), d, w).as("s"))
      .head().getAs[scala.collection.Seq[Long]]("s").toArray

  test("estimates never undercount, and overcount within eps*N") {
    val s = build(items.toDF("key"))
    val n = items.size
    truth.foreach { case (k, t) =>
      val est = CountMinSketch.estimate(s, d, w, k)
      assert(est >= t, s"$k undercounted: $est < $t")
      assert(est <= t + math.ceil(0.005 * n * 3).toLong,
        s"$k overcounted far beyond the eps bound: $est vs $t (N=$n)")
    }
  }

  test("sketch matrix is byte-identical under any partition layout") {
    val df = items.toDF("key")
    val base = build(df)
    assert(java.util.Arrays.equals(base, build(df.repartition(32))))
    assert(java.util.Arrays.equals(base, build(df.repartition(5, col("key")))))
    assert(java.util.Arrays.equals(base, build(df.coalesce(1))))
  }

  test("total mass is preserved exactly in every row") {
    val s = build(items.toDF("key"))
    (0 until d).foreach { r =>
      val rowSum = (0 until w).map(c => s(r * w + c)).sum
      assert(rowSum == items.size.toLong, s"row $r mass $rowSum")
    }
  }

  test("sizing follows the textbook bounds") {
    val (d1, w1) = CountMinSketch.sizing(0.01, 0.01)
    assert(w1 >= 270 && w1 <= 280, s"w=$w1") // ceil(e/0.01) = 272
    assert(d1 == 5, s"d=$d1")                // ceil(ln 100) = 5
    intercept[IllegalArgumentException](CountMinSketch.sizing(0.0, 0.5))
    // silent width saturation would overflow depth*width to a negative
    // array size at aggregation time, far from the sizing call
    intercept[IllegalArgumentException](CountMinSketch.sizing(1e-9, 0.01))
  }
}

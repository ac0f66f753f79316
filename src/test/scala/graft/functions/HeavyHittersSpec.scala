package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(items: Seq[String], k: Int,
                       parts: Int): Map[String, Long] =
    items.toDF("item").repartition(parts)
      .agg(HeavyHitters.sketch(col("item"), k).as("hh"))
      .as[Seq[(String, Long)]].head().toMap

  test("exact when k covers the alphabet") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(7)("c")
    Seq(1, 8).foreach { parts =>
      assert(sketchOf(items, k = 5, parts) == Map("a" -> 40L, "b" -> 25L, "c" -> 7L))
    }
  }

  test("MG bounds hold under any partition layout: true-n/(k+1) <= est <= true") {
    // zipf-ish synthetic: item i appears ~ 2000/i times
    val items = (1 to 40).flatMap(i => Seq.fill(2000 / i)(s"t$i"))
    val truth = items.groupBy(identity).map { case (i, xs) => (i, xs.size.toLong) }
    val n = items.size.toLong
    val k = 10
    Seq(1, 4, 32).foreach { parts =>
      val est = sketchOf(scala.util.Random.shuffle(items.toList), k, parts)
      est.foreach { case (i, e) =>
        assert(e <= truth(i), s"$i overestimated: $e > ${truth(i)} ($parts parts)")
        assert(e >= truth(i) - n / (k + 1),
          s"$i est $e below bound ${truth(i) - n / (k + 1)} ($parts parts)")
      }
      // coverage: every item above the n/(k+1) threshold is reported
      truth.filter(_._2 > n / (k + 1)).keys.foreach { i =>
        assert(est.contains(i), s"missing heavy hitter $i ($parts parts)")
      }
      assert(est.size <= k)
    }
  }

  test("sketch state never exceeds k entries and works grouped") {
    val df = graft.Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang"))
      .agg(HeavyHitters.sketch(col("tok"), 8).as("hh"))
    val rows = df.as[(String, Seq[(String, Long)])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, hh) =>
      assert(hh.size <= 8)
      // sorted by estimate desc then item asc
      assert(hh == hh.sortBy { case (i, c) => (-c, i) })
    }
  }

  test("top-1 is exact when the leader clears the 2n/(k+1) gap") {
    val items = Seq.fill(5000)("leader") ++
      (1 to 200).flatMap(i => Seq.fill(10)(s"x$i"))
    val est = sketchOf(scala.util.Random.shuffle(items.toList), k = 20, parts = 16)
    assert(est.maxBy { case (i, c) => (c, i) }._1 == "leader")
  }

  test("null keys are skipped, not tracked (finish would NPE on a null " +
    "map key otherwise)") {
    import spark.implicits._
    val est = Seq("a", null, "a", "b", null, null)
      .toDF("x").repartition(2)
      .agg(HeavyHitters.sketch(col("x"), 4).as("hh"))
      .as[Seq[(String, Long)]].head()
    assert(est == Seq(("a", 2L), ("b", 1L)))
  }
}

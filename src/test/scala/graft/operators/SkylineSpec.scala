package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long, Long)]): Set[Long] = {
    def dom(a: (Long, Long, Long, Long), b: (Long, Long, Long, Long)): Boolean =
      a._2 >= b._2 && a._3 >= b._3 && a._4 >= b._4 &&
        (a._2 > b._2 || a._3 > b._3 || a._4 > b._4)
    pts.filter(p => !pts.exists(q => dom(q, p))).map(_._1).toSet
  }

  private def run(pts: Seq[(Long, Long, Long, Long)], parts: Int): Set[Long] = {
    val df = pts.toDF("id", "d1", "d2", "d3").repartition(parts)
    Skyline.of(df, Seq("d1", "d2", "d3")).select("id").as[Long].collect().toSet
  }

  test("matches brute force on a 300-point pseudorandom cloud, any partitioning") {
    val rnd = new scala.util.Random(42)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val want = brute(pts)
    assert(want.nonEmpty && want.size < pts.size)
    for (parts <- Seq(1, 3, 7)) assert(run(pts, parts) == want, s"parts=$parts")
  }

  test("duplicate points on the frontier are all kept (no strict dominator)") {
    val pts = Seq((1L, 5L, 5L, 5L), (2L, 5L, 5L, 5L), (3L, 1L, 1L, 1L),
      (4L, 6L, 1L, 1L))
    // (5,5,5) twins: tie on all dims is not dominance; (1,1,1) is dominated
    assert(run(pts, 2) == Set(1L, 2L, 4L))
  }

  test("anti-chain input (all incomparable) returns everything") {
    val pts = (0L until 20L).map(i => (i, i, 19L - i, 7L))
    assert(run(pts, 3) == pts.map(_._1).toSet)
  }

  test("empty input yields empty skyline") {
    assert(run(Nil, 2) == Set.empty[Long])
  }

  test("single-dimension degenerates to argmax (with ties)") {
    val df = Seq((1L, 3L), (2L, 9L), (3L, 9L), (4L, 1L)).toDF("id", "d1")
    val got = Skyline.of(df, Seq("d1")).select("id").as[Long].collect().toSet
    assert(got == Set(2L, 3L))
  }

  test("q156 golden: skyline members are pairwise incomparable and beat the rest") {
    val out = Skyline.q156_skyline3d(spark, sfDir)
      .select("c_custkey", "total_cents", "n_orders", "last_day")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 9)
    val ids = out.map(_._1).toSet
    // recompute the aggregate and brute-force the frontier
    val all = graft.Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("id"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("d1"),
        count(lit(1)).as("d2"),
        max(expr("unix_micros(o_orderdate) div 86400000000")).as("d3"))
      .as[(Long, Long, Long, Long)].collect()
    assert(brute(all.toSeq) == ids)
  }
}

package graft.operators

import graft.SparkSpec

class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def brute(seeds: Set[Long], edges: Seq[(Long, Long)],
      rounds: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val step = for {
        (u, d) <- dist.toSeq; v <- adj.getOrElse(u, Nil)
      } yield v -> (d + 1L)
      dist = (dist.toSeq ++ step).groupBy(_._1)
        .view.mapValues(_.map(_._2).min).toMap
    }
    dist
  }

  private def run(seeds: Seq[Long], edges: Seq[(Long, Long)], rounds: Int,
      parts: Int): Map[Long, Long] =
    Bfs.hops(seeds.toDF("id").repartition(parts),
        edges.toDF("src", "dst").repartition(parts), rounds)
      .as[(Long, Long)].collect().toMap

  test("matches brute force on a pseudorandom digraph, any layout") {
    val rnd = new scala.util.Random(21)
    val edges = (1 to 300).map(_ =>
      (rnd.nextInt(50) + 1L, rnd.nextInt(50) + 1L)).filter(e => e._1 != e._2).distinct
    val seeds = Seq(1L, 25L)
    val want = brute(seeds.toSet, edges, 4)
    assert(want.size > 2, "seeds reach nothing — fixture too sparse")
    for (parts <- Seq(1, 3, 8))
      assert(run(seeds, edges, 4, parts) == want, s"parts=$parts")
  }

  test("chain graph: hops equal position, cut off at the round bound") {
    val chain = (1L until 10L).map(i => (i, i + 1))
    val got = run(Seq(1L), chain, 5, 2)
    assert(got == (1L to 6L).map(i => i -> (i - 1)).toMap)
  }

  test("overlapping frontiers take the minimum distance") {
    // 1 → 2 → 3 and 9 → 3: vertex 3 is 1 hop from seed 9, not 2 from seed 1
    val got = run(Seq(1L, 9L), Seq((1L, 2L), (2L, 3L), (9L, 3L)), 3, 2)
    assert(got(3L) == 1L)
  }

  test("seedless components never appear") {
    val got = run(Seq(1L), Seq((1L, 2L), (5L, 6L)), 3, 2)
    assert(got == Map(1L -> 0L, 2L -> 1L))
  }

  test("q159 golden: seeds at zero, every hop step is a real edge away") {
    val out = ScalarQueries.q159_bfs_hops(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(out.nonEmpty)
    val seeds = out.filter(_._2 == 0L).keySet
    assert(seeds.nonEmpty && seeds.forall(_ % 100 == 0))
    assert(out.values.max <= 5L)
    // non-seed hop values are contiguous from 1 (a frontier can't skip)
    val hops = out.values.toSet
    (0L to out.values.max).foreach(h => assert(hops.contains(h)))
  }
}

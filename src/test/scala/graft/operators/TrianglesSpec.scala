package graft.operators

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val cnt = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, b) <- edges
      c <- adj(a) if c > b && adj(b).contains(c)
    } { cnt(a) += 1; cnt(b) += 1; cnt(c) += 1 }
    cnt.toMap
  }

  private def run(edges: Seq[(Long, Long)], parts: Int): Map[Long, Long] =
    Triangles.perVertexDegreeOrdered(edges.toDF("a", "b").repartition(parts))
      .as[(Long, Long)].collect().toMap

  test("matches brute force on pseudorandom graphs, any partitioning") {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 300).map(_ => (rnd.nextInt(40) + 1L, rnd.nextInt(40) + 1L))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct
    val want = brute(edges)
    assert(want.nonEmpty)
    for (parts <- Seq(1, 4)) assert(run(edges, parts) == want, s"parts=$parts")
  }

  test("counts each triangle once: K4 gives 3 per vertex") {
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    assert(run(k4, 2) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle-free star emits nothing") {
    val star = (2L to 30L).map(l => (1L, l))
    assert(run(star, 2).isEmpty)
  }

  test("agrees with q151's id-oriented method on the fixture graph") {
    val und = ScalarQueries.q139_geo_cell_join(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    val viaDegree = run(und, 4)
    assert(viaDegree == brute(und))
  }

  test("degree orientation never owns more wedges than id orientation, " +
    "and collapses the hub blowup") {
    // hub 1 connected to 200 spokes + a 10-clique among high ids: the
    // id-oriented owner of every hub pair is the hub (19900 wedges);
    // degree-ordered, each spoke (deg 1) owns its single hub edge and
    // the hub owns nothing
    val star = (2L to 201L).map(l => (1L, l))
    val clique = for { a <- 300L to 309L; b <- (a + 1) to 309L } yield (a, b)
    val und = (star ++ clique).toDF("a", "b")
    val wDeg = Triangles.wedgeCountDegreeOrdered(und)
    val wId = Triangles.wedgeCountIdOrdered(und)
    assert(wDeg <= wId)
    assert(wId >= 19900L) // the hub's quadratic fan-out
    assert(wDeg <= 500L)  // bounded by the clique's internal wedges
    // and the counts are still exact
    val got = Triangles.perVertexDegreeOrdered(und).as[(Long, Long)]
      .collect().toMap
    assert(got == brute(star ++ clique))
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** In-JVM replay of the exact integer recurrence (positive longs, so
    * Java / is the same floor division as Spark's div / DuckDB's //). */
  private def brute(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (s, d) => in(d) += pr(s) / deg(s) }
      pr = nodes.map(n => n -> (150000L + 85L * in(n) / 100L)).toMap
    }
    pr
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int,
      parts: Int): Map[Long, Long] = {
    val n = nodes.toDF("id").repartition(parts)
    val e = edges.toDF("src", "dst").repartition(parts)
    PageRank.ranks(n, e, iters).as[(Long, Long)].collect().toMap
  }

  test("matches the integer recurrence on a pseudorandom digraph, any layout") {
    val rnd = new scala.util.Random(7)
    val nodes = (1L to 60L).toSeq
    val edges = (1 to 400).map(_ =>
      (rnd.nextInt(60) + 1L, rnd.nextInt(60) + 1L)).distinct.filter(e => e._1 != e._2)
    val want = brute(nodes, edges, 5)
    for (parts <- Seq(1, 3, 7))
      assert(run(nodes, edges, 5, parts) == want, s"parts=$parts")
  }

  test("star graph: the hub out-ranks every leaf, leaves are identical") {
    val nodes = (0L to 8L).toSeq
    val edges = (1L to 8L).flatMap(l => Seq((l, 0L), (0L, l)))
    val pr = run(nodes, edges, 5, 3)
    val leafRanks = (1L to 8L).map(pr)
    assert(leafRanks.toSet.size == 1)
    assert(pr(0L) > leafRanks.head)
    assert(pr == brute(nodes, edges, 5))
  }

  test("isolated vertices settle at the damping floor") {
    val pr = run(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 1L)), 4, 2)
    assert(pr(3L) == 150000L)
  }

  test("one iteration of a two-cycle keeps both ranks at scale") {
    // each node sends its full 1e6 to the other: pr = 150000 + 850000
    val pr = run(Seq(1L, 2L), Seq((1L, 2L), (2L, 1L)), 1, 1)
    assert(pr == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("q157 golden: every grid vertex present, floor respected, hub exists") {
    val out = ScalarQueries.q157_pagerank(spark, sfDir)
      .as[(Long, Long)].collect()
    assert(out.length == 15)
    assert(out.map(_._1).toSeq == out.map(_._1).sorted.toSeq)
    assert(out.forall(_._2 >= 150000L))
    // the fixture graph is connected enough that someone beats the floor
    assert(out.exists(_._2 > 150000L))
  }
}

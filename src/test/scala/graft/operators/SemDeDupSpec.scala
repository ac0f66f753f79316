package graft.operators

import graft.{SparkSpec, Tables}

class SemDeDupSpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Full in-JVM replay of the q158 rule: Lloyd assignment to centroids
    * 0..7 (tie to lower cid), within-cluster pairs ia<ib, micro-unit
    * cosine threshold, keep-lowest-id greedy drop. */
  private def brute(vecs: Array[(Long, Array[Float])],
      cents: Array[(Long, Array[Float])]): Map[Long, (Long, Long, Long)] = {
    val assign = vecs.map { case (id, v) =>
      id -> cents.map { case (cid, cv) =>
        (r6(dot(v, v) - 2.0 * dot(v, cv) + dot(cv, cv)), cid)
      }.min._2
    }.toMap
    val out = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    for {
      (cid, vs) <- vecs.groupBy(v => assign(v._1))
      (ia, va) <- vs; (ib, vb) <- vs if ia < ib
    } {
      val cos = dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb)))
      val cm = BigDecimal(cos * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      if (cm >= 400000L) {
        val (c0, n0, m0) = out.getOrElse(ib, (cid, 0L, Long.MinValue))
        out(ib) = (c0, n0 + 1L, math.max(m0, cm))
      }
    }
    out.toMap
  }

  test("q158 matches the in-JVM brute force on the full fixture") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val want = brute(vecs, vecs.filter(_._1 < 8))
    assert(want.nonEmpty, "vacuous gate: no near-dups at tau=0.40")
    val got = NorthStarQueries.q158_semdedup(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, cid, n, m) => id -> (cid, n, m) }.toMap
    assert(got == want)
  }

  test("dropped vectors never include a cluster's lowest surviving id") {
    // the keeper rule: a vec is dropped only by a SMALLER id, so the
    // minimum vec_id of every cluster always survives
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val cents = vecs.filter(_._1 < 8)
    val assign = vecs.map { case (id, v) =>
      id -> cents.map { case (cid, cv) =>
        (r6(dot(v, v) - 2.0 * dot(v, cv) + dot(cv, cv)), cid)
      }.min._2
    }.toMap
    val minPerCluster = assign.groupBy(_._2).map { case (_, m) => m.keys.min }.toSet
    val dropped = NorthStarQueries.q158_semdedup(spark, sfDir)
      .select("vec_id").as[Long].collect().toSet
    assert(minPerCluster.intersect(dropped).isEmpty)
  }

  test("re-running on the survivor set is a fixpoint (no new dups)") {
    // against the SAME centroids, assignment is per-vector, so survivors
    // keep their clusters; a survivor had no >=tau smaller-id partner in
    // the full corpus, hence none in the subset — empty second pass
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val cents = vecs.filter(_._1 < 8)
    val dropped = brute(vecs, cents).keySet
    val survivors = vecs.filterNot(v => dropped(v._1))
    assert(brute(survivors, cents).isEmpty)
  }
}

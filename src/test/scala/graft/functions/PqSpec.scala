package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-quantization pins: exact reconstruction ⇒ ADC == true distance
  * (recall 1 vs brute force), real-fixture recall vs the exact L2 top-k,
  * layout-independent encoding, and the compression shape itself.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  /** vectors assembled from ksub=4 distinct, well-separated sub-patterns
    * per subspace (dim 8, m 2): ids 0..3 carry the 4 distinct combos, so
    * min-id init starts ON the true centroids and Lloyd stays there —
    * reconstruction error is exactly 0
    */
  private def gridCorpus: DataFrame = {
    def pat(s: Int, j: Int): Array[Float] =
      Array.tabulate(4)(d => if (d == j) 10f * (s + 1) else 0f)
    // diagonal enumeration of the 16 combos so ids 0..3 carry DISTINCT
    // patterns in BOTH subspaces (min-id init must start on 4 distinct
    // sub-centroids per subspace)
    val rows = (0 until 16).map { i =>
      val a = pat(0, i % 4)
      val b = pat(1, (i % 4 + i / 4) % 4)
      (i.toLong, a ++ b)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def exactTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val d2 = graft.Det.dotD(col("pv"), col("pv")) +
      graft.Det.dotD(col("cv"), col("cv")) -
      lit(2.0) * graft.Det.dotD(col("pv"), col("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("d2").asc, col("neighbor_id").asc)
    broadcast(p).crossJoin(c)
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("d2", graft.Det.r6(d2))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("d2"), col("rank"))
  }

  test("zero reconstruction error ⇒ ADC distances equal true distances " +
    "and the top-k matches brute force exactly") {
    val corpus = gridCorpus
    val probes = corpus.filter(col("vec_id") < 3)
    val cb = Pq.train(corpus, "vec_id", "embedding", dim = 8, m = 2, ksub = 4)
    val enc = Pq.encode(corpus, "vec_id", "embedding", dim = 8, m = 2, cb)
    val adc = Pq.adcTopK(probes, enc, "vec_id", "embedding",
      dim = 8, m = 2, cb, k = 5)
    val exact = exactTopK(corpus, probes, 5)
    val a = adc.select("probe_id", "neighbor_id", "adc_d2")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val e = exact.select("probe_id", "neighbor_id", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // same scored pair set, same distances (ADC is exact when vectors
    // sit ON their sub-centroids) — modulo distance ties at the rank-k
    // boundary, so compare distance maps on the intersection + sizes
    assert(a.keySet === e.keySet)
    a.foreach { case (k2, d) => assert(math.abs(d - e(k2)) < 1e-6, k2) }
  }

  test("real-fixture recall@10 vs exact L2 stays useful, and finer " +
    "quantization (more subspaces) improves it") {
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val probes = corpus.orderBy(col("vec_id")).limit(5)
    val want = exactTopK(corpus, probes, 10)
      .select("probe_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(m: Int, ksub: Int): Double = {
      val cb = Pq.train(corpus, "vec_id", "embedding", dim = 64, m = m,
        ksub = ksub, iters = 4)
      val enc = Pq.encode(corpus, "vec_id", "embedding", dim = 64, m = m, cb)
      val got = Pq.adcTopK(probes, enc, "vec_id", "embedding",
          dim = 64, m = m, cb, k = 10)
        .select("probe_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(want).size.toDouble / want.size
    }
    val coarse = recallAt(4, 16)
    val fine = recallAt(16, 16)
    // the fixture embeddings are near-random synthetic vectors — the
    // worst case for coarse PQ (no cluster structure to exploit); the pin
    // is the TREND (resolution buys recall) plus a usefulness floor
    assert(fine > coarse, s"fine=$fine coarse=$coarse")
    assert(fine >= 0.5, s"recall@10 (m=16) = $fine")
    assert(coarse >= 0.15, s"recall@10 (m=4) = $coarse")
  }

  test("encoding is layout-independent given a fixed codebook") {
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cb = Pq.train(corpus, "vec_id", "embedding", dim = 64, m = 4,
      ksub = 16, iters = 2).cache()
    def codes(parts: Int): Map[Long, Seq[Int]] =
      Pq.encode(corpus.repartition(parts), "vec_id", "embedding",
          dim = 64, m = 4, cb)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val base = codes(1)
    assert(codes(4) === base)
    assert(codes(32) === base)
  }

  test("ivfAdcTopK with nprobe >= cell count equals plain adcTopK; " +
    "routed nprobe=2 keeps most of the full-scan ADC answer") {
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val probes = corpus.orderBy(col("vec_id")).limit(5)
    val nCells = 5
    val assign = Ann.kmeans(corpus, "vec_id", "embedding", nCells, iters = 3)
      .cache()
    val cb = Pq.train(corpus, "vec_id", "embedding", dim = 64, m = 8,
      ksub = 16, iters = 3).cache()
    val enc = Pq.encode(corpus, "vec_id", "embedding", dim = 64, m = 8, cb)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("probe_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = pairs(Pq.adcTopK(probes, enc, "vec_id", "embedding",
      dim = 64, m = 8, cb, k = 10))
    val all = pairs(Pq.ivfAdcTopK(probes, corpus, assign, "vec_id",
      "embedding", dim = 64, m = 8, cb, k = 10, nprobe = nCells))
    assert(all == full, "nprobe = cell count must pass every candidate")
    val routed = pairs(Pq.ivfAdcTopK(probes, corpus, assign, "vec_id",
      "embedding", dim = 64, m = 8, cb, k = 10, nprobe = 2))
    val recall = routed.intersect(full).size.toDouble / full.size
    assert(recall >= 0.3, s"nprobe=2/$nCells ADC recall=$recall")
    // the encode-once production entry point returns the identical
    // answer to the re-encoding convenience overload
    val encodedPath = pairs(Pq.ivfAdcTopKEncoded(probes, corpus, assign,
      enc, "vec_id", "embedding", dim = 64, m = 8, cb, k = 10,
      nprobe = nCells))
    assert(encodedPath == all)
  }

  test("the compression shape: m codes per vector, each within [0, ksub)") {
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cb = Pq.train(corpus, "vec_id", "embedding", dim = 64, m = 8,
      ksub = 8, iters = 2)
    val enc = Pq.encode(corpus, "vec_id", "embedding", dim = 64, m = 8, cb)
    val bad = enc.filter(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 8)).count()
    assert(bad === 0L)
    assert(enc.count() === corpus.count())
  }
}

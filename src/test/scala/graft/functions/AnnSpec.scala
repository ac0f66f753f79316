package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sfDir)

  test("brute force: a duplicated vector is its twin's top-1 with cos 1") {
    val twin = emb.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(100000L))
    val corpus = emb.union(twin)
    val probes = corpus.filter(col("vec_id") === 100000L)
    val top = Ann.bruteForceTopK(probes, corpus, 1).collect().head
    assert(top.getAs[Long]("neighbor_id") == 0L)
    assert(top.getAs[Double]("cos_sim") == 1.0)
  }

  test("cosine similarity is bounded to [-1, 1] across all probe pairs") {
    val probes = emb.filter(col("vec_id") < 3)
    val out = Ann.bruteForceTopK(probes, emb, 500)
    assert(out.filter(col("cos_sim") > 1.0 || col("cos_sim") < -1.0).count() == 0)
  }

  test("SRP signature is deterministic and buckets identical vectors together") {
    val sig = emb.limit(50).select(col("vec_id"),
      Ann.srpSignature(col("embedding"), 16).as("sig"))
    val again = emb.limit(50).select(col("vec_id"),
      Ann.srpSignature(col("embedding"), 16).as("sig"))
    assert(sig.collect().toSet == again.collect().toSet)
    assert(sig.select("sig").distinct().count() > 1) // not all in one bucket
  }

  test("SRP ANN achieves useful recall of the exact top-5") {
    val probes = emb.filter(col("vec_id") < 10)
    val exact = Ann.bruteForceTopK(probes, emb, 5)
      .select("probe_id", "neighbor_id")
    val approx = Ann.srpTopK(probes, emb, 5, nbits = 16, prefixBits = 2)
      .select("probe_id", "neighbor_id")
    val hit = exact.join(approx, Seq("probe_id", "neighbor_id"), "left_semi").count()
    val recall = hit.toDouble / exact.count()
    // prefixBits=2 → candidates ≈ 1/4 of corpus; SRP-coherent neighbors
    assert(recall >= 0.5, s"recall $recall")
  }

  test("IVF search returns k ranked neighbors per probe from probed cells only") {
    val probes = emb.filter(col("vec_id") < 5)
    val out = Ann.ivfTopK(emb, probes, "label", k = 5, nprobe = 2)
    val counts = out.groupBy("probe_id").count().collect()
    assert(counts.length == 5 && counts.forall(_.getLong(1) == 5))
    // top-1 under nprobe=full must match brute force; under nprobe=2 the
    // probe's own cell is always scanned (its centroid contains it), so
    // the returned list is plausible: ranks strictly 1..5
    val ranks = out.groupBy("probe_id").agg(collect_list("rank").as("r"))
      .collect().map(_.getSeq[Int](1).sorted.toList)
    assert(ranks.forall(_ == List(1, 2, 3, 4, 5)))
  }

  test("kmeans: deterministic under repartitioning, cells in [0,k), total coverage") {
    val a1 = Ann.kmeans(emb, "vec_id", "embedding", k = 8, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = Ann.kmeans(emb.repartition(17, col("label")), "vec_id",
        "embedding", k = 8, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 == a2)
    assert(a1.size == emb.count())
    assert(a1.values.forall(c => c >= 0 && c < 8))
  }

  test("kmeans: more Lloyd iterations never increase inertia") {
    def inertia(iters: Int): Double = {
      val cells = Ann.kmeans(emb, "vec_id", "embedding", k = 8, iters = iters)
      val joined = emb.join(cells, "vec_id")
      val cents = joined.select(col("cell"), posexplode(col("embedding")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"),
          transform(col("pm"), p => p.getField("m").cast("float")).as("c"))
      joined.join(cents, "cell")
        .select((graft.Det.dotD(col("embedding"), col("embedding"))
          + graft.Det.dotD(col("c"), col("c"))
          - lit(2.0) * graft.Det.dotD(col("embedding"), col("c"))).as("d2"))
        .agg(sum(col("d2"))).head().getDouble(0)
    }
    val i1 = inertia(1)
    val i3 = inertia(3)
    val i5 = inertia(5)
    assert(i3 <= i1 + 1e-6 && i5 <= i3 + 1e-6, s"inertia grew: $i1 -> $i3 -> $i5")
  }

  test("kmeans separates obvious synthetic clusters") {
    import spark.implicits._
    // 3 tight groups far apart on distinct axes
    val rnd = new scala.util.Random(7)
    val rows = for {
      g <- 0 until 3
      i <- 0 until 40
    } yield {
      val v = Array.fill(8)(rnd.nextFloat() * 0.01f)
      v(g) = 10f + rnd.nextFloat() * 0.01f
      ((g * 40 + i).toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val cells = Ann.kmeans(df, "vec_id", "embedding", k = 3, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val byGroup = cells.groupBy(_._1 / 40).view.mapValues(_.map(_._2).toSet)
    // every synthetic group lands in exactly one cell, and the cells differ
    assert(byGroup.values.forall(_.size == 1))
    assert(byGroup.values.flatten.toSet.size == 3)
  }

  test("semantic dedup finds near-identical pairs and keeps useful recall " +
    "vs the unblocked all-pairs oracle") {
    val ground = Dedup.embeddingNearDups(
        emb.withColumn("all", lit(1)), "vec_id", "embedding", "all", 0.95)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = Dedup.semanticNearDups(emb, "vec_id", "embedding",
        threshold = 0.95, k = 8, iters = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem.subsetOf(ground), "blocked pairs must be a subset of all-pairs")
    if (ground.nonEmpty) {
      val recall = sem.size.toDouble / ground.size
      assert(recall >= 0.8, s"semantic-dedup recall $recall too low " +
        s"(${sem.size}/${ground.size})")
    }
  }
}

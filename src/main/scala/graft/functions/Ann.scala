package graft.functions

import graft.Det
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search over an `Array[Float]` embedding
  * column.
  *
  * Three tiers:
  *  1. `bruteForceTopK` — exact cosine top-k, probe side broadcast, corpus
  *     side streamed map-side. Correctness baseline (q82 uses this shape);
  *     fine whenever |probes| is bounded.
  *  2. `srpTopK` — signed-random-projection LSH (Charikar STOC 2002
  *     rounding-hyperplane sketch): each vector gets a
  *     `nbits`-bit signature from deterministic ±1 hyperplanes
  *     (sign pattern derived from xxhash64(plane,dim) — no RNG state, so
  *     the bucketing is reproducible). Probes only score candidates whose
  *     signature agrees on a bucket prefix → the corpus scan drops to
  *     1/2^prefixBits of the data per probe, at recall < 1.
  *  3. `ivfTopK` — IVF-style coarse quantization: centroids from a
  *     `groupBy(coarseKey).avg` pass; probes search only the `nprobe`
  *     nearest centroids' partitions. The 100 TB path: the corpus is
  *     bucketed/partitioned by centroid id on disk, so a probe reads only
  *     its shards (partition pruning), never the full corpus.
  */
object Ann {

  private def cosine(a: Column, b: Column): Column =
    Det.dotD(a, b) / (Det.l2norm(a) * Det.l2norm(b))

  /** Exact cosine top-k per probe. */
  def bruteForceTopK(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    broadcast(p).crossJoin(c)
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", Det.r6(cosine(col("pv"), col("cv"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** Deterministic ±1 projection of `v` onto hyperplane `plane`:
    * sum_d v[d] * sign(xxhash64(plane:d)). Sign pattern is pseudo-random
    * but fixed — identical on every executor and every run.
    */
  private def srpBit(v: Column, plane: Int): Column = {
    val proj = aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
        when(pmod(xxhash64(concat_ws(":", lit(plane.toString), i)), lit(2)) === 0,
          x.cast("double")).otherwise(-x.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    when(proj > 0, 1L).otherwise(0L)
  }

  /** nbits-bit SRP signature as a long column. */
  def srpSignature(v: Column, nbits: Int): Column =
    (0 until nbits).map(b => shiftleft(srpBit(v, b), b))
      .reduce((a, c) => a.bitwiseOR(c))

  /** ANN top-k: candidates = corpus rows whose `prefixBits`-bit SRP bucket
    * is within Hamming distance 1 of the probe's (multi-probe LSH: the
    * probe side explodes to its own bucket + each single-bit flip, so a
    * near neighbor is missed only when ≥2 prefix bits disagree). The
    * corpus is hashed once; each probe touches ≈ (1+prefixBits)/2^prefixBits
    * of it instead of all of it.
    */
  def srpTopK(probes: DataFrame, corpus: DataFrame, k: Int,
              nbits: Int = 16, prefixBits: Int = 4): DataFrame = {
    val mask = (1L << prefixBits) - 1
    val p0 = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
      srpSignature(col("embedding"), nbits).bitwiseAND(mask).as("bucket0"))
    val multiprobe = array(
      col("bucket0") +: (0 until prefixBits).map(b =>
        col("bucket0").bitwiseXOR(lit(1L << b))): _*)
    val p = p0.select(col("probe_id"), col("pv"),
      explode(multiprobe).as("bucket"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      srpSignature(col("embedding"), nbits).bitwiseAND(mask).as("bucket"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    broadcast(p).join(c, "bucket")
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", Det.r6(cosine(col("pv"), col("cv"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** IVF-style search: coarse centroids = per-`coarseKey` mean vectors
    * (one aggregation pass; with no labels, any clustering assignment
    * column works). Probes pick their `nprobe` closest centroids, then
    * score only corpus vectors in those cells.
    */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, coarseKey: String,
              k: Int, nprobe: Int = 2): DataFrame = {
    // dimension-agnostic centroids: explode to (cell, pos, value), average
    // per position, reassemble ordered by pos — works for any vector dim
    val cells = corpus
      .select(col(coarseKey).as("cell"), posexplode(col("embedding")))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("col")).as("m"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell"),
        transform(col("pm"), p => p.getField("m").cast("float")).as("centroid"))
    val pw = Window.partitionBy(col("probe_id"))
      .orderBy(col("cent_sim").desc, col("cell").asc)
    val probeCells = broadcast(probes
        .select(col("vec_id").as("probe_id"), col("embedding").as("pv")))
      .crossJoin(broadcast(cells))
      .withColumn("cent_sim", cosine(col("pv"), col("centroid")))
      .withColumn("cr", row_number().over(pw))
      .filter(col("cr") <= nprobe)
      .select(col("probe_id"), col("pv"), col("cell"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    probeCells
      .join(corpus.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("cv"), col(coarseKey).as("cell")),
        Seq("cell"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", Det.r6(cosine(col("pv"), col("cv"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }
}

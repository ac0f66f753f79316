package graft.functions

import graft.Det
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for nearest-neighbor search at scale (Jégou,
  * Douze, Schmid, TPAMI 2011 — public literature; the FAISS IVFADC
  * building block). The vector is split into `m` subspaces; each subspace
  * gets its own `ksub`-cell codebook (deterministic Lloyd — the
  * [[Ann.kmeans]] discipline); a vector is stored as `m` small codes
  * instead of `dim` floats (64-dim float → 4 bytes at m=4/ksub≤256, a 64×
  * compression), and probe-to-vector distance is approximated
  * asymmetrically (ADC): the probe computes one exact `m × ksub` table of
  * sub-distances, and every corpus vector's distance is `m` table lookups
  * summed — no corpus float math at query time.
  *
  * Where this sits in the ANN ladder (SURVEY §2.3): [[Ann.bruteForceTopK]]
  * is the exact baseline, [[Ann.srpTopK]]/[[Ann.ivfTopK]] cut the
  * CANDIDATE COUNT; PQ cuts the PER-CANDIDATE cost and memory — at 100 TB
  * the encoded corpus is small enough to keep hot, and composing with IVF
  * (route to cells, then ADC within the cell) is the standard
  * billion-vector layout.
  *
  * Determinism: codebooks come from [[Ann.kmeans]] (min-id init, fixed
  * budget — no RNG), code assignment ties break toward the lower cell id,
  * so encode/search results are pure functions of the input (layout-
  * independent; spec-pinned). Unit-test tier: centroid float averaging is
  * partition-order-dependent in the last ulps (the q98 precedent), so no
  * SQL oracle replays the cells.
  */
object Pq {

  /** subspace s of vector v (s may be a literal or the codebook row's
    * `sub` column)
    */
  private def sub(v: Column, s: Column, dsub: Int): Column =
    slice(v, s * lit(dsub) + lit(1), lit(dsub))

  private def l2sq(a: Column, b: Column): Column =
    Det.dotD(a, a) + Det.dotD(b, b) - lit(2.0) * Det.dotD(a, b)

  /** Per-subspace codebooks: `(sub, cell, centroid)` with `m × ksub` rows.
    * One [[Ann.kmeans]] per subspace over the sliced corpus, then the
    * final cells' per-dimension means (the same reassembly the kmeans
    * update step uses).
    *
    * @param dim full vector dimension (must divide evenly by m — callers
    *            know their schema; passing it avoids a driver action)
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
            m: Int, ksub: Int, iters: Int = 5): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must be divisible by m=$m")
    val dsub = dim / m
    (0 until m).map { s =>
      val sliced = corpus.select(col(idCol),
        sub(col(vecCol), lit(s), dsub).as("__sv"))
      Ann.meanVectors(
          Ann.kmeans(sliced, idCol, "__sv", ksub, iters).join(sliced, idCol),
          col("cell"), col("__sv"), "cell", "centroid")
        .select(lit(s).as("sub"), col("cell"), col("centroid"))
    }.reduce(_ unionByName _)
  }

  /** Encode every corpus vector as its `m` nearest-sub-centroid codes:
    * `(id, codes)` with `codes(s)` = argmin cell of subspace s (ties to
    * the lower cell id). One corpus scan against the broadcast codebook;
    * the per-(row, sub) argmin is a commutative `min(struct(d2, cell))` —
    * no window, two-phase aggregable, so encoding shuffles only
    * `(id, sub, best)` rows, never vectors.
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
             m: Int, codebook: DataFrame): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must be divisible by m=$m")
    val dsub = dim / m
    corpus.select(col(idCol), col(vecCol).as("__v"))
      .crossJoin(broadcast(codebook))
      .withColumn("__d2",
        l2sq(sub(col("__v"), col("sub"), dsub), col("centroid")))
      .groupBy(col(idCol), col("sub"))
      .agg(min(struct(col("__d2"), col("cell"))).as("__best"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(
        struct(col("sub"), col("__best").getField("cell").as("cell"))))
        .as("__sc"))
      .select(col(idCol),
        transform(col("__sc"), x => x.getField("cell")).as("codes"))
  }

  /** ADC top-k: probes compute their exact `m × ksub` sub-distance table
    * against the broadcast codebook (tiny — probes × m × ksub rows);
    * every encoded corpus vector is scored by summing its `m` table
    * lookups. The corpus-side cost is an `m`-row explode + one broadcast
    * equi-join + a two-phase sum — no float vector math, no corpus
    * shuffle of embeddings. Returns `(probe_id, neighbor_id, adc_d2,
    * rank)` with `rank` by (adc_d2 asc, neighbor_id asc).
    */
  def adcTopK(probes: DataFrame, encoded: DataFrame, idCol: String,
              vecCol: String, dim: Int, m: Int, codebook: DataFrame,
              k: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must be divisible by m=$m")
    val dsub = dim / m
    val table = probes
      .select(col(idCol).as("probe_id"), col(vecCol).as("__pv"))
      .crossJoin(broadcast(codebook))
      .select(col("probe_id"), col("sub"), col("cell"),
        l2sq(sub(col("__pv"), col("sub"), dsub), col("centroid")).as("__d2c"))
    val codeRows = encoded.select(col(idCol).as("neighbor_id"),
        posexplode(col("codes")).as(Seq("sub", "cell")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc_d2").asc, col("neighbor_id").asc)
    codeRows
      .join(broadcast(table), Seq("sub", "cell"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .groupBy(col("probe_id"), col("neighbor_id"))
      .agg(Det.r6(sum(col("__d2c"))).as("adc_d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("adc_d2"), col("rank"))
  }

  /** The FULL IVFADC pipeline (Jégou et al. 2011 §IV): probes route to
    * their `nprobe` nearest coarse cells (exact L2 against per-cell mean
    * centroids computed from the corpus + a coarse `assign`ment, e.g.
    * [[Ann.kmeans]]'s), and ADC scoring runs ONLY over the codes stored
    * in those cells — combining IVF's candidate-count cut with PQ's
    * per-candidate cost cut, the standard billion-vector layout.
    *
    * With `nprobe` ≥ the cell count the routing filter passes everything
    * and the result equals [[adcTopK]] exactly (spec-pinned); smaller
    * `nprobe` trades recall for a corpus-fraction scan, measured against
    * [[Ann.bruteForceTopK]] ground truth in the spec.
    *
    * Scale shape: centroids are |cells| rows (broadcast), the routed
    * (probe, ccell) set is |probes|·nprobe rows (broadcast), and the
    * corpus-side work is ONE equi-join on the coarse cell + the adcTopK
    * lookup join — encoded codes shuffle, vectors never do.
    */
  def ivfAdcTopK(probes: DataFrame, corpus: DataFrame, assign: DataFrame,
                 idCol: String, vecCol: String, dim: Int, m: Int,
                 codebook: DataFrame, k: Int, nprobe: Int = 2): DataFrame =
    ivfAdcTopKEncoded(probes, corpus, assign,
      encode(corpus, idCol, vecCol, dim, m, codebook),
      idCol, vecCol, dim, m, codebook, k, nprobe)

  /** [[ivfAdcTopK]] over a PRE-ENCODED corpus — the production entry
    * point. Codes are immutable per codebook, so a batch of Q probe
    * queries should pay ONE `encode` pass (materialized like `assign`),
    * not Q of them; the convenience overload above re-encodes per call
    * and is for one-shot use. Mirrors [[adcTopK]]'s encoded-input shape.
    */
  def ivfAdcTopKEncoded(probes: DataFrame, corpus: DataFrame,
                        assign: DataFrame, encoded: DataFrame,
                        idCol: String, vecCol: String, dim: Int, m: Int,
                        codebook: DataFrame, k: Int,
                        nprobe: Int = 2): DataFrame = {
    require(nprobe >= 1, s"nprobe=$nprobe must be >= 1")
    require(m >= 1 && dim % m == 0, s"dim=$dim must be divisible by m=$m")
    val withCell = corpus.join(assign, idCol)
    // per-cell mean centroids: the shared Ann.meanVectors reassembly
    val cells =
      Ann.meanVectors(withCell, col("cell"), col(vecCol), "ccell", "ccent")
    val rw = Window.partitionBy(col("probe_id"))
      .orderBy(col("__cd2").asc, col("ccell").asc)
    val routed = probes
      .select(col(idCol).as("probe_id"), col(vecCol).as("__pv"))
      .crossJoin(broadcast(cells))
      .withColumn("__cd2", l2sq(col("__pv"), col("ccent")))
      .withColumn("__crk", row_number().over(rw))
      .filter(col("__crk") <= nprobe)
      .select(col("probe_id"), col("ccell"))
    // ADC restricted to the routed cells: candidate (probe, neighbor)
    // pairs come from the coarse-cell equi-join, then each pair sums its
    // m sub-distance lookups
    val table = probes
      .select(col(idCol).as("probe_id"), col(vecCol).as("__pv"))
      .crossJoin(broadcast(codebook))
      .select(col("probe_id"), col("sub"), col("cell"),
        l2sq(sub(col("__pv"), col("sub"), dim / m), col("centroid"))
          .as("__d2c"))
    val codeRows = encoded
      .join(assign.select(col(idCol), col("cell").as("ccell")), idCol)
      .join(broadcast(routed), Seq("ccell"))
      .filter(col("probe_id") =!= col(idCol))
      .select(col("probe_id"), col(idCol).as("neighbor_id"),
        posexplode(col("codes")).as(Seq("sub", "cell")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc_d2").asc, col("neighbor_id").asc)
    codeRows
      .join(broadcast(table), Seq("probe_id", "sub", "cell"))
      .groupBy(col("probe_id"), col("neighbor_id"))
      .agg(Det.r6(sum(col("__d2c"))).as("adc_d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("adc_d2"), col("rank"))
  }
}

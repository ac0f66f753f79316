package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-moment PCA + whitening for embedding columns — the
  * representation-space transform a training-data pipeline runs before
  * semantic dedup and ANN (whitened embeddings make cosine thresholds
  * comparable across dimensions; SemDeDup-style pipelines whiten before
  * clustering, retrieval stacks whiten before product quantization so
  * per-subspace codebooks see isotropic residuals).
  *
  * Layout independence is the design center, the same discipline as the
  * sketch family (Bloom/Hll/count-min): every element is quantized ONCE
  * to integer micro units and the fitted model derives from exact BIGINT
  * moment sums (Σq_d, Σq_d·q_e, n) — integer addition is commutative and
  * associative, so ANY partition layout, merge tree, or AQE plan yields
  * the IDENTICAL sums, and the driver-side eigensolve is a pure function
  * of them. `PcaSpec` pins model equality to the BIT under 1/4/32
  * partitionings. (Contrast: summing raw floats is partition-order-
  * dependent — the house float-boundary rule applied to model fitting.)
  *
  * Eigensolve: power iteration with Hotelling deflation on the d×d
  * covariance (d = embedding width, NOT corpus size — 64×64 here; the
  * corpus never leaves the executors, only the O(d²) moment vector
  * does). Deterministic start (basis vector of the largest diagonal
  * entry) — no randomness anywhere.
  *
  * 100 TB shape: one pass, state O(d²) longs per task merged in a
  * treeReduce — the classic covariance-sketch reduction; driver state is
  * ONE O(d²) buffer independent of partition count. Moment sums overflow
  * int64
  * past ~10⁹ rows at full micro range (q_d·q_e ≤ 10¹² each); shard the
  * fit per day/source and average covariances, or widen the buffer to
  * 128-bit — the plan shape is unchanged.
  *
  * Whitening applies the model with codegen'd array built-ins
  * (`zip_with`/`aggregate` against literal component vectors) — no UDF
  * in the projection path.
  */
object Pca {

  /** Fitted model: `mean` in original units; `components` row-major
    * (k × d, unit L2 norm); `eigvals` the explained variances (≥ 0,
    * descending).
    */
  case class Model(dim: Int, n: Long, mean: Array[Double],
                   components: Array[Array[Double]],
                   eigvals: Array[Double])

  /** Exact integer moment buffer: n, Σq (d longs), Σq·qᵀ upper triangle
    * (d(d+1)/2 longs), with q = round(x·10⁶).
    */
  private final class Moments(val dim: Int) extends Serializable {
    var n: Long = 0L
    val s: Array[Long] = new Array[Long](dim)
    val c: Array[Long] = new Array[Long](dim * (dim + 1) / 2)
  }

  /** One distributed pass → exact (n, Σq, Σqqᵀ). */
  private def moments(df: DataFrame, vecCol: String,
                      dim: Int): (Long, Array[Long], Array[Long]) = {
    // per-partition imperative fold (the shape the sketch tier uses):
    // one Moments per partition, d(d+1)/2 longs of state, merged in a
    // treeReduce — integer adds are commutative AND associative, so any
    // merge-tree shape yields the identical sums (PcaSpec pins 1/4/32
    // layouts to the bit), and the driver receives exactly ONE O(d²)
    // buffer regardless of partition count (at d=512 over 10k partitions
    // a driver-side merge would hold ~10 GiB; the tree holds one ~1 MiB
    // buffer per executor level)
    val rdd = df.select(col(vecCol)).rdd.mapPartitions { it =>
      val m = new Moments(dim)
      it.foreach { r =>
        val v = r.getSeq[Float](0)
        if (v != null && v.length == dim) {
          val q = new Array[Long](dim)
          var i = 0
          while (i < dim) {
            q(i) = math.round(v(i).toDouble * 1000000d); i += 1
          }
          m.n += 1
          var k = 0
          i = 0
          while (i < dim) {
            m.s(i) += q(i)
            var j = i
            while (j < dim) { m.c(k) += q(i) * q(j); k += 1; j += 1 }
            i += 1
          }
        }
      }
      Iterator.single((m.n, m.s, m.c))
    }
    if (rdd.getNumPartitions == 0)
      (0L, new Array[Long](dim), new Array[Long](dim * (dim + 1) / 2))
    else rdd.treeReduce { case ((n1, s1, c1), (n2, s2, c2)) =>
      // mutate the left buffers in place: each is partition-local or a
      // previous merge product, never shared
      var i = 0
      while (i < s1.length) { s1(i) += s2(i); i += 1 }
      i = 0
      while (i < c1.length) { c1(i) += c2(i); i += 1 }
      (n1 + n2, s1, c1)
    }
  }

  /** Fit the top-k components from one exact-moment pass. */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int,
          iters: Int = 200): Model = {
    require(k >= 1 && k <= dim, s"k=$k out of [1,$dim]")
    val (n, s, c) = moments(df, vecCol, dim)
    require(n > 1, s"PCA needs at least 2 rows, got $n")
    val mean = s.map(_.toDouble / n / 1e6)
    // covariance from exact integers: (Σqq'/n − mean_q mean_q') / 1e12
    val cov = Array.ofDim[Double](dim, dim)
    var idx = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = (c(idx).toDouble / n -
          (s(i).toDouble / n) * (s(j).toDouble / n)) / 1e12
        cov(i)(j) = v; cov(j)(i) = v
        idx += 1; j += 1
      }
      i += 1
    }
    val comps = Array.ofDim[Double](k, dim)
    val lams = new Array[Double](k)
    val work = cov.map(_.clone())
    for (m <- 0 until k) {
      // deterministic start: basis vector of the largest remaining
      // diagonal entry (ties → lowest index)
      var best = 0
      for (d2 <- 1 until dim) if (work(d2)(d2) > work(best)(best)) best = d2
      var v = Array.tabulate(dim)(d2 => if (d2 == best) 1.0 else 0.0)
      var lam = 0.0
      var it = 0
      while (it < iters) {
        val w = new Array[Double](dim)
        var a = 0
        while (a < dim) {
          var acc = 0.0
          var b2 = 0
          while (b2 < dim) { acc += work(a)(b2) * v(b2); b2 += 1 }
          w(a) = acc; a += 1
        }
        val norm = math.sqrt(w.map(x => x * x).sum)
        if (norm == 0.0) it = iters
        else {
          v = w.map(_ / norm); lam = norm; it += 1
        }
      }
      // sign convention: first nonzero coordinate positive
      val nz = v.indexWhere(math.abs(_) > 1e-12)
      if (nz >= 0 && v(nz) < 0) v = v.map(-_)
      comps(m) = v; lams(m) = lam
      // Hotelling deflation: work -= lam v v'
      var a = 0
      while (a < dim) {
        var b2 = 0
        while (b2 < dim) { work(a)(b2) -= lam * v(a) * v(b2); b2 += 1 }
        a += 1
      }
    }
    Model(dim, n, mean, comps, lams)
  }

  /** Whitened k-dim projection as a codegen'd array column:
    * w_j = (x − mean)·u_j / √(λ_j + eps). No UDF — `zip_with` +
    * `aggregate` against literal vectors.
    */
  def whitenColumn(vecCol: Column, model: Model,
                   eps: Double = 1e-12): Column = {
    val centered = zip_with(vecCol.cast("array<double>"),
      typedLit(model.mean.toSeq), (a, b) => a - b)
    val projs = model.components.zip(model.eigvals).map { case (u, lam) =>
      val dot = aggregate(
        zip_with(centered, typedLit(u.toSeq), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)
      dot / lit(math.sqrt(lam + eps))
    }
    array(projs.toSeq: _*)
  }

  /** df + `outCol`: the whitened projection of `vecCol`. */
  def whiten(df: DataFrame, vecCol: String, model: Model,
             outCol: String = "white"): DataFrame =
    df.withColumn(outCol, whitenColumn(col(vecCol), model))
}

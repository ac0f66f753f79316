package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic fixed-size samples without a reservoir's sequential
  * state: bottom-k selection over a content-hash priority. The classic
  * reservoir algorithms (Vitter's R, Efraimidis–Spirakis A-ES) are
  * stream-sequential; their DISTRIBUTED form is exactly "assign every row
  * an independent priority, keep the k best" — which makes the sample a
  * pure function of row content once the randomness comes from a hash
  * instead of an RNG. Same rationale as [[Sampling]]: `rand(seed)` draws
  * per-partition streams, so a repartition silently changes the sample;
  * a hash priority is stable across runs, layouts, engines, and corpus
  * growth, and the selection is MERGEABLE — bottom-k of a union equals
  * bottom-k of concatenated per-part bottom-ks, so shard-local samples
  * combine into the exact global sample (the property a 100 TB pipeline
  * needs to sample per-shard and merge driver-side).
  *
  * - [[uniform]]: k rows with the smallest `md5(key)` — every row equally
  *   likely under the hash's uniformity (a KMV-style bottom-k).
  * - [[weighted]]: Efraimidis–Spirakis 2006 ("Weighted random sampling
  *   with a reservoir"): row i gets an Exp(w_i) draw `e_i = −ln(u_i)/w_i`
  *   from a hash-derived uniform `u_i`; the k SMALLEST draws win, giving
  *   inclusion probability proportional to weight without replacement —
  *   the weighted corpus-subsample step (per-source boosts, quality-score
  *   weighting) run as one scan + top-k.
  *
  * Scale shape: both are `sort.limit(k)` plans, which Spark executes as
  * `TakeOrderedAndProject` — per-partition bounded heaps, no global sort,
  * no shuffle of the full input.
  */
object Reservoir {

  /** hash-derived uniform in (0,1): 8 hex chars of md5 → 32-bit value v,
    * u = (v + 0.5) / 2^32 — never exactly 0 or 1, so ln(u) is finite
    */
  private def hashUniform(key: Column): Column =
    (conv(Sampling.hashHex(key, 8), 16, 10).cast("double") + lit(0.5)) /
      lit(4294967296.0)

  /** deterministic uniform k-sample: the k rows whose `md5(key)` is
    * smallest (key ties broken by the key itself; keys should be unique)
    */
  def uniform(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    df.withColumn("__h", Sampling.hashHex(key, 16))
      .orderBy(col("__h"), key)
      .limit(k)
      .drop("__h")
  }

  /** deterministic weighted k-sample (A-ES): keep the k smallest
    * `−ln(u)/w`; weights must be strictly positive
    */
  def weighted(df: DataFrame, key: Column, weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    df.withColumn("__pri", -log(hashUniform(key)) / weight.cast("double"))
      .orderBy(col("__pri"), key)
      .limit(k)
      .drop("__pri")
  }

  /** the A-ES draw for one (key, weight) — the driver-side reference the
    * spec compares against; EXACTLY the expression [[weighted]] evaluates
    */
  private[functions] def referenceDraw(keyStr: String, w: Double): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(keyStr.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    val v = java.lang.Long.parseLong(hex, 16)
    -math.log((v + 0.5) / 4294967296.0) / w
  }
}

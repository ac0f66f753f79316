package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** t-digest quantile sketch (Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests", 2019 — public literature) as a mergeable
  * typed `Aggregator`: the quantile member of the sketch family next to
  * HLL (cardinality), Misra–Gries (top-k), count-min (point frequency)
  * and Bloom (membership). Answers any-quantile queries over 100 TB with
  * a few-KB summary per group, most accurate at the tails — the
  * percentile_approx alternative whose state you can persist and merge
  * across days.
  *
  * This is the MERGING variant with the k₁ scale function
  * `k(q) = (δ/2π)·asin(2q−1)`: a centroid may absorb neighbors while the
  * k-distance it spans stays ≤ 1, which caps centroid count at ~2δ and
  * concentrates resolution near q→0/1 (tail rank error ~ q(1−q)/δ).
  * Like every mergeable summary here, the exact centroid layout depends
  * on merge order — only the BOUNDS are layout-independent (the
  * HeavyHitters rule), so this stays a unit-tier capability, not a
  * hash-checked declared query.
  *
  * State is ≤2δ centroids plus a bounded pending buffer, regardless of
  * input size; `reduce` is amortized O(1) per row (buffer + periodic
  * merge-compress), `merge` concatenates and recompresses.
  */
case class TDigest(compression: Double, centroids: Seq[(Double, Long)],
    min: Double, max: Double, count: Long) {

  /** Interpolated quantile estimate; exact at q=0/1 (true min/max). */
  def quantile(q: Double): Double = {
    require(count > 0L, "quantile of an empty digest")
    if (q <= 0.0) min
    else if (q >= 1.0) max
    else {
      val target = q * count
      // anchor points: (mass, value) at 0→min, each centroid's mass
      // midpoint→mean, count→max; linear interpolation between anchors
      var prevMass = 0.0
      var prevVal = min
      var cum = 0L
      var i = 0
      while (i < centroids.length) {
        val (m, w) = centroids(i)
        val center = cum + w / 2.0
        if (target <= center) {
          val span = center - prevMass
          return if (span <= 0) m
          else prevVal + (m - prevVal) * (target - prevMass) / span
        }
        prevMass = center; prevVal = m; cum += w; i += 1
      }
      val span = count - prevMass
      if (span <= 0) max else prevVal + (max - prevVal) * (target - prevMass) / span
    }
  }
}

object TDigest {
  private[functions] def kScale(q: Double, delta: Double): Double =
    delta / (2.0 * math.Pi) * math.asin(2.0 * q - 1.0)

  /** Merge-compress sorted-or-not centroids to the k₁ size bound. */
  private[functions] def compress(cs: Seq[(Double, Long)],
      delta: Double): Vector[(Double, Long)] = {
    if (cs.isEmpty) return Vector.empty
    val sorted = cs.sortBy(_._1).toVector
    val total = sorted.iterator.map(_._2).sum.toDouble
    val out = Vector.newBuilder[(Double, Long)]
    var (m, w) = sorted.head
    var cumBefore = 0L
    sorted.tail.foreach { case (cm, cw) =>
      val qLeft = cumBefore / total
      val qRight = (cumBefore + w + cw) / total
      if (kScale(qRight, delta) - kScale(qLeft, delta) <= 1.0) {
        val nw = w + cw
        m += (cm - m) * cw / nw
        w = nw
      } else {
        out += ((m, w)); cumBefore += w; m = cm; w = cw
      }
    }
    out += ((m, w))
    out.result()
  }
}

object TDigestAgg {
  /** buffered state: compressed centroids + raw pending values */
  case class State(centroids: Vector[(Double, Long)], pending: Vector[Double],
      min: Double, max: Double, count: Long)

  private val PendingCap = 512

  /** untyped Column form for DataFrame `agg` over a double column */
  def sketch(col: Column, compression: Double): Column =
    udaf(new TDigestAgg(compression), Encoders.DOUBLE).apply(col)
}

/** Input is BOXED double so a nullable column deserializes instead of
  * crashing on AssertNotNull; nulls are skipped in reduce like every
  * sibling sketch (Bloom/Hll/CMS) and like percentile_approx. */
class TDigestAgg(compression: Double)
  extends Aggregator[java.lang.Double, TDigestAgg.State, TDigest] {
  require(compression >= 20.0, s"compression=$compression too small to bound error")
  import TDigestAgg._

  override def zero: State =
    State(Vector.empty, Vector.empty, Double.PositiveInfinity,
      Double.NegativeInfinity, 0L)

  private def flush(s: State): State =
    if (s.pending.isEmpty) s
    else State(
      TDigest.compress(s.centroids ++ s.pending.map((_, 1L)), compression),
      Vector.empty, s.min, s.max, s.count)

  override def reduce(s: State, boxed: java.lang.Double): State = {
    if (boxed == null) return s
    val x = boxed.doubleValue()
    val s2 = State(s.centroids, s.pending :+ x,
      math.min(s.min, x), math.max(s.max, x), s.count + 1L)
    if (s2.pending.length >= PendingCap) flush(s2) else s2
  }

  override def merge(a: State, b: State): State = {
    val fa = flush(a); val fb = flush(b)
    State(TDigest.compress(fa.centroids ++ fb.centroids, compression),
      Vector.empty, math.min(fa.min, fb.min), math.max(fa.max, fb.max),
      fa.count + fb.count)
  }

  override def finish(s: State): TDigest = {
    val f = flush(s)
    TDigest(compression, f.centroids, f.min, f.max, f.count)
  }

  override def bufferEncoder: Encoder[State] = Encoders.kryo[State]
  override def outputEncoder: Encoder[TDigest] = ExpressionEncoder[TDigest]()
}

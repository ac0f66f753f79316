package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Count-min sketch as a mergeable typed `Aggregator` — point-frequency
  * ESTIMATES for every key in fixed space, completing the sketch family:
  * HLL (how many distinct), Misra–Gries (who are the top-k, underestimate),
  * Bloom (was this one seen), count-min (how often was ANY key seen,
  * overestimate).
  *
  * Guarantees (Cormode & Muthukrishnan 2005; depth d rows × width w
  * counters):
  *   - `estimate(x) ≥ true(x)` always (hash collisions only ADD);
  *   - `estimate(x) ≤ true(x) + (e/w)·N` with probability `1 − e^{−d}`
  *     (N = total insertions).
  *
  * Merge is element-wise addition of the count matrices — commutative and
  * associative, so ANY partition layout or AQE merge tree yields the
  * IDENTICAL matrix (integer sums, no near-threshold drift: stronger than
  * Misra–Gries, same layout-independence class as Bloom's OR). Row hashes
  * come from xxhash64 with per-row seeds — the same fixed-seed
  * determinism as the rest of the dedup tier.
  *
  * The 100 TB use: per-partition sketches combine to an exact-cost
  * `O(d·w)` state no matter how many shuffled rows feed it — frequency
  * lookups for vocabulary-scale key sets (token counts, URL hit counts)
  * where the exact (key, count) table is itself a shuffle you want to
  * avoid, and where Misra–Gries's k-survivor set is too coarse.
  */
class CountMinSketch(depth: Int, width: Int)
  extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth >= 1 && depth <= 16, s"depth=$depth out of [1,16]")
  require(width >= 2, s"width=$width must be >= 2")
  require(depth.toLong * width <= Int.MaxValue,
    s"matrix ${depth}x$width overflows a single array — lower eps or shard")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], item: String): Array[Long] = {
    if (item != null) {
      val u = UTF8String.fromString(item)
      var r = 0
      while (r < depth) {
        b(r * width + CountMinSketch.bucket(u, r, width)) += 1L
        r += 1
      }
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMinSketch {

  private[functions] def bucket(item: UTF8String, row: Int, width: Int): Int =
    java.lang.Math.floorMod(XXH64.hashUTF8String(item, 42L + row), width.toLong)
      .toInt

  /** Point query: min over the d counters the key hashes to. */
  def estimate(sketch: Array[Long], depth: Int, width: Int,
               item: String): Long = {
    val u = UTF8String.fromString(item)
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = sketch(r * width + bucket(u, r, width))
      if (c < best) best = c
      r += 1
    }
    best
  }

  /** (depth, width) for additive error ≤ eps·N with failure probability
    * delta: the textbook `w = ⌈e/eps⌉`, `d = ⌈ln(1/delta)⌉`.
    */
  def sizing(eps: Double, delta: Double): (Int, Int) = {
    require(eps > 0 && eps < 1 && delta > 0 && delta < 1,
      s"bad sizing ($eps, $delta)")
    val d = math.ceil(math.log(1.0 / delta)).toInt.max(1)
    val wReal = math.ceil(math.E / eps)
    require(d * wReal <= Int.MaxValue.toDouble,
      f"matrix ${d}x$wReal%.0f overflows a single array for eps=$eps — " +
        "a silent saturation would blow the error bound; raise eps or shard")
    val w = wReal.toInt.max(2)
    (d, w)
  }

  /** untyped Column form: `agg(CountMinSketch.sketch(col, d, w))` */
  def sketch(col: Column, depth: Int, width: Int): Column =
    udaf(new CountMinSketch(depth, width), Encoders.STRING).apply(col)
}

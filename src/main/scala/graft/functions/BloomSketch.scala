package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Mergeable Bloom filter as a typed `Aggregator` — the set-MEMBERSHIP
  * sketch next to HLL (cardinality) and Misra–Gries (frequency) in the
  * §2.3 sketch family: "have we seen this key?" over 100 TB in a
  * fixed-size bit array, with NO false negatives and a tunable
  * false-positive rate.
  *
  * The 100 TB use is one-sided pre-filtering: build the filter over a
  * key set (seen URLs, eval-benchmark grams, already-ingested doc ids) in
  * one distributed agg — bitwise-OR is commutative/associative/idempotent,
  * so ANY partition layout or AQE merge tree yields the IDENTICAL bit
  * array (unlike Misra–Gries, where only the bounds are layout-free) —
  * then broadcast the bytes and drop the guaranteed-absent majority at
  * scan speed, reserving the exact (shuffling) join for possible members.
  * The incremental-dedup (q75) and contamination (q101) shapes use this
  * when the authoritative side is too big to broadcast exactly.
  *
  * Standard Kirsch–Mitzenmacher double hashing: bit indexes
  * `h1 + i·h2 mod m` from one 64-bit xxhash64 split into two halves —
  * k-independent-enough for the classic `(1 − e^{−kn/m})^k` rate.
  * Deterministic everywhere (fixed seed, no layout dependence), so the
  * same inputs always produce byte-identical filters.
  *
  * Sizing: `m = −n·ln(p)/ln(2)²` bits, `k = (m/n)·ln(2)` hashes — callers
  * pass capacity (expected distinct n) and target rate p; ~1.2 KB per 1k
  * keys at p=0.01.
  */
class BloomSketch(numBits: Int, numHashes: Int)
  extends Aggregator[String, Array[Byte], Array[Byte]] {
  require(numBits >= 8, s"numBits=$numBits must be >= 8")
  require(numHashes >= 1, s"numHashes=$numHashes must be >= 1")

  private val numBytes = (numBits + 7) / 8

  override def zero: Array[Byte] = new Array[Byte](numBytes)

  override def reduce(b: Array[Byte], item: String): Array[Byte] = {
    if (item != null) BloomSketch.setBits(b, numBits, numHashes, item)
    b
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < numBytes) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def finish(b: Array[Byte]): Array[Byte] = b

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomSketch {

  /** xxhash64 of the UTF-8 bytes with a fixed seed — the same hash family
    * the engine's dedup tier uses; one 64-bit value split into two 32-bit
    * halves drives the Kirsch–Mitzenmacher index sequence.
    */
  private def hash64(item: String): Long =
    XXH64.hashUTF8String(UTF8String.fromString(item), 42L)

  private[functions] def setBits(bytes: Array[Byte], numBits: Int,
                                 numHashes: Int, item: String): Unit = {
    val h = hash64(item)
    val h1 = (h >>> 32).toInt
    val h2 = h.toInt | 1 // odd step => full cycle over power-of-two sizes
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, numBits)
      bytes(bit >>> 3) = (bytes(bit >>> 3) | (1 << (bit & 7))).toByte
      i += 1
    }
  }

  /** Driver/executor-side membership probe against the aggregated bytes. */
  def mightContain(filter: Array[Byte], numBits: Int, numHashes: Int,
                   item: String): Boolean =
    mightContainU(filter, numBits, numHashes, UTF8String.fromString(item))

  /** UTF8String form — the interpreted path of
    * [[graft.expressions.BloomMightContain]] (codegen inlines the same
    * loop); identical bytes hash identically on build and probe sides.
    * Fails loudly when the filter bytes are shorter than the declared
    * sizing (a build/probe mismatch would otherwise read out of bounds
    * mid-query).
    */
  def mightContainU(filter: Array[Byte], numBits: Int, numHashes: Int,
                    item: UTF8String): Boolean = {
    if (filter.length < (numBits + 7) / 8)
      throw new IllegalArgumentException(
        s"bloom filter has ${filter.length} bytes but numBits=$numBits " +
          s"needs ${(numBits + 7) / 8} — build/probe sizing mismatch")
    val h = XXH64.hashUTF8String(item, 42L)
    val h1 = (h >>> 32).toInt
    val h2 = h.toInt | 1
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, numBits)
      if ((filter(bit >>> 3) & (1 << (bit & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** (m, k) for an expected `capacity` distinct keys at false-positive
    * rate `p`: the textbook optimum, rounded up / clamped to >= 1.
    * REJECTS capacities whose optimal bit count exceeds a single array
    * (~268 MB of filter) — a silent `.toInt` saturation there would hand
    * back a "valid" sizing whose real FP rate is orders of magnitude
    * above the request; shard the key space across several filters
    * instead.
    */
  def sizing(capacity: Long, p: Double): (Int, Int) = {
    require(capacity > 0 && p > 0 && p < 1, s"bad sizing ($capacity, $p)")
    val ln2 = math.log(2.0)
    val mReal = math.ceil(-capacity * math.log(p) / (ln2 * ln2))
    require(mReal <= Int.MaxValue.toDouble,
      f"optimal filter needs $mReal%.3g bits (> Int.MaxValue) for " +
        s"capacity=$capacity at p=$p — shard the key space across filters")
    val m = mReal.toInt.max(8)
    val k = math.round(m.toDouble / capacity * ln2).toInt.max(1)
    (m, k)
  }

  /** untyped Column form: `agg(BloomSketch.sketch(col, m, k))` → binary */
  def sketch(col: Column, numBits: Int, numHashes: Int): Column =
    udaf(new BloomSketch(numBits, numHashes), Encoders.STRING).apply(col)
}

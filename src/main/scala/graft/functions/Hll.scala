package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.expressions.XXH64

/** HyperLogLog as a mergeable typed `Aggregator` — the distinct-count
  * member of the sketch family owned end-to-end (next to Misra–Gries,
  * count-min, Bloom, t-digest; Spark's built-in `approx_count_distinct`
  * stays spec-pinned as the reference implementation, this one exposes
  * the REGISTERS so sketches can be stored, shipped, and merged across
  * jobs — the cross-run corpus-cardinality ledger a 100 TB pipeline
  * keeps per shard/day and unions later, which an opaque built-in
  * aggregate cannot do).
  *
  * Flajolet–Fuss–Gandouet–Meunier 2007: `m = 2^p` one-byte registers;
  * each item's 64-bit xxhash64 splits into a p-bit register index and a
  * (64−p)-bit suffix whose leading-zero run updates the register with
  * `max`. Estimate = `α_m · m² / Σ 2^{−M_j}`, with the small-range
  * linear-counting correction (`m · ln(m/V)` when `E ≤ 2.5m` and empty
  * registers remain). The 64-bit hash makes the classic 32-bit
  * large-range correction unnecessary. Relative standard error ≈
  * `1.04/√m` (p=12 ⇒ m=4096 ⇒ ~1.6%).
  *
  * Merge is element-wise `max` — commutative, associative, idempotent —
  * so ANY partition layout or AQE merge tree yields the IDENTICAL
  * register array (the Bloom-OR layout-independence class; stronger than
  * an estimate-level guarantee: the BYTES agree).
  */
class Hll(p: Int) extends Aggregator[String, Array[Byte], Array[Byte]] {
  require(p >= 4 && p <= 18, s"p=$p out of [4,18]")
  private val m = 1 << p

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(b: Array[Byte], item: String): Array[Byte] = {
    if (item != null) {
      val h = XXH64.hashUTF8String(UTF8String.fromString(item), Hll.Seed)
      val idx = (h >>> (64 - p)).toInt
      // rank = leading-zero run of the suffix + 1, capped so it fits the
      // (64-p)-bit suffix: an all-zero suffix ranks 64-p+1
      val suffix = h << p
      val rank =
        (if (suffix == 0L) 64 - p + 1
         else java.lang.Long.numberOfLeadingZeros(suffix) + 1).toByte
      if (rank > b(idx)) b(idx) = rank
    }
    b
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(b: Array[Byte]): Array[Byte] = b

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object Hll {

  /** fixed hash seed — same determinism discipline as the dedup tier */
  private[functions] val Seed = 106L

  private def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Cardinality estimate from a register array (any `p`; `m` is the
    * array length). Pure function of the bytes — two sketches with equal
    * registers estimate identically, whatever path built them.
    */
  def estimate(registers: Array[Byte]): Long = {
    val m = registers.length
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.pow(2.0, -registers(i).toDouble)
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha(m) * m.toDouble * m.toDouble / invSum
    val corrected =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(corrected)
  }

  /** untyped Column form: `agg(Hll.sketch(col, p))` → register bytes */
  def sketch(col: Column, p: Int = 12): Column =
    udaf(new Hll(p), Encoders.STRING).apply(col)

  /** [[estimate]] as a Column over register bytes. A Scala UDF is
    * acceptable HERE only because it runs post-aggregation on
    * group-cardinality-bounded rows (|groups| sketches), never on the
    * scan path — the scan-side work is the codegen'd/udaf sketch agg.
    */
  def estimateCol(registers: Column): Column =
    org.apache.spark.sql.functions
      .udf((b: Array[Byte]) => estimate(b)).apply(registers)
}

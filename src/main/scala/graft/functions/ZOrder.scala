package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys for multi-dimensional data skipping.
  *
  * Parquet keeps per-row-group min/max statistics, but a table sorted on
  * ONE column only prunes predicates on that column — a filter on any
  * other dimension still reads every row group. Interleaving the bits of
  * two columns into one sort key makes row groups cluster in BOTH
  * dimensions at once: a 2-D box predicate then intersects O(perimeter)
  * row groups instead of O(all of them). This is the standard lakehouse
  * layout trick (Delta/Iceberg `ZORDER BY`), here as a plain column
  * expression feeding `sortWithinPartitions`/`orderBy` before a write —
  * no writer support needed, and the expression constant-folds into a
  * codegen'd shift/or chain.
  *
  * Keys are built from the low `bits` of each column after the caller's
  * normalization (rank, offset, or bucket id — values must be
  * non-negative; 2·bits ≤ 62 keeps the key in a positive long).
  */
object ZOrder {

  /** Morton-interleave the low `bits` of two non-negative long columns:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1.
    */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of [1,31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x.cast("long"), i) % 2, 2 * i),
        shiftleft(shiftright(y.cast("long"), i) % 2, 2 * i + 1))
    }
    terms.reduce(_ + _) // disjoint bit positions: + == |
  }
}

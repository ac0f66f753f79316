package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch as a mergeable typed `Aggregator` —
  * the frequency analog of the HLL cardinality tier (§2.3): top-k terms
  * over 100 TB without shuffling the full (token, count) table, at the
  * price of a bounded underestimate.
  *
  * Guarantees (k counters over n items; Misra & Gries 1982, mergeability
  * per Agarwal et al., "Mergeable Summaries", PODS'12):
  *   - every reported estimate is an UNDERestimate:
  *     `true − n/(k+1) ≤ est ≤ true`;
  *   - every item with true count > n/(k+1) is present in the sketch.
  *
  * `merge` is the PODS'12 form: sum counters keyed by item, then subtract
  * the (k+1)-largest combined count and drop non-positives — the error
  * bounds add across merges, so the guarantee holds under ANY partition
  * layout / merge tree Spark chooses. The REPORTED SET can differ between
  * layouts for items near the threshold (inherent to every mergeable
  * heavy-hitters summary — only the bounds are layout-independent), which
  * is why this stays a unit-tier capability rather than a hash-checked
  * declared query, exactly like approx_count_distinct.
  *
  * State is a ≤k-entry map regardless of input size. The decrement step
  * walks the k entries only when a new item meets a full sketch —
  * amortized O(1) per decremented count since each decrement cancels one
  * prior increment.
  */
class HeavyHitters(k: Int)
  extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(k >= 1, s"k=$k must be >= 1")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    // skip nulls like the sibling sketches (Bloom/Hll/CMS) — a null key
    // would survive to finish() and NPE its Ordering[String] sort
    if (item == null) b
    else b.get(item) match {
      case Some(c) => b.updated(item, c + 1L)
      case None if b.size < k => b.updated(item, 1L)
      case None =>
        // decrement-all: cancels one increment per surviving counter
        b.iterator.map { case (i, c) => (i, c - 1L) }
          .filter(_._2 > 0L).toMap
    }

  override def merge(a: Map[String, Long],
                     b: Map[String, Long]): Map[String, Long] = {
    val summed = (a.keySet ++ b.keySet).iterator
      .map(i => i -> (a.getOrElse(i, 0L) + b.getOrElse(i, 0L))).toMap
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-largest count, keep strictly positive
      val kth1 = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      summed.iterator.map { case (i, c) => (i, c - kth1) }
        .filter(_._2 > 0L).toMap
    }
  }

  /** (item, estimate) sorted by estimate desc, item asc. */
  override def finish(b: Map[String, Long]): Seq[(String, Long)] =
    b.toSeq.sortBy { case (i, c) => (-c, i) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}

object HeavyHitters {
  /** untyped Column form for DataFrame `agg` over a string column */
  def sketch(col: Column, k: Int): Column =
    udaf(new HeavyHitters(k), Encoders.STRING).apply(col)
}

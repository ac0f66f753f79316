package graft.functions

import org.apache.spark.sql.DataFrame

/** Size-triggered scale escalations (round 9) — the documented
  * extreme-scale swaps made CODE PATHS instead of prose.
  *
  * SCALE.md prescribes operator swaps that only matter past a size the
  * fixtures never reach (q211's per-lang rank window → [[ScalableRank]];
  * q186's exact distinct → [[Hll]] registers). Before this round those
  * swaps existed only as scaladoc — nothing forced them to keep working.
  * Each swap point now consults the PLAN-ESTIMATED input size (Catalyst's
  * `optimizedPlan.stats.sizeInBytes` — file-size-based for parquet scans,
  * a metadata read, NO action or extra scan; the same signal AQE-style
  * decisions use) against a Spark-conf threshold, so a test can set a
  * synthetic 1-byte threshold and drive the escalated path over the real
  * fixtures while production defaults keep the exact path until the data
  * genuinely outgrows it.
  *
  * Threshold semantics per key:
  *  - [[RankEscalateBytesKey]] (default 64 GiB): above this, per-group
  *    rank windows swap to ScalableRank's bucketed two-phase form. The
  *    swap is EXACT — identical output either way (spec-pinned equality)
  *    — so flipping automatically is safe; the default is merely where
  *    the single-task-per-group window stops being plausible.
  *  - [[DistinctEscalateBytesKey]] (default never): above this, exact
  *    `countDistinct` swaps to Hll register estimates. This CHANGES the
  *    emitted values (~1.6% rsd at p=12 — spec-pinned band), so it never
  *    flips implicitly: a pipeline opts in deliberately, like choosing
  *    `approx_count_distinct`.
  */
object Escalation {

  val RankEscalateBytesKey = "graft.scale.rank.escalateBytes"
  val DistinctEscalateBytesKey = "graft.scale.distinct.escalateBytes"

  /** 64 GiB: past this a single group's sort no longer belongs in one
    * window task. Deliberately conservative — ScalableRank is exact, so
    * a premature flip costs only an extra bounded shuffle. */
  val RankDefaultBytes: Long = 64L << 30

  /** Plan-estimated size of `df` in bytes — metadata only, no action. */
  def planBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** True when `df`'s estimated size crosses the conf'd threshold for
    * `key` (falling back to `defaultBytes`). A negative or zero
    * threshold escalates everything — the spec's synthetic-threshold
    * lever.
    */
  def escalate(df: DataFrame, key: String, defaultBytes: Long): Boolean = {
    val threshold = df.sparkSession.conf.getOption(key).map { v =>
      try v.trim.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"spark conf $key must be a byte count (long), got '$v'")
      }
    }.getOrElse(defaultBytes)
    planBytes(df) >= BigInt(threshold)
  }

  def escalateRank(df: DataFrame): Boolean =
    escalate(df, RankEscalateBytesKey, RankDefaultBytes)

  def escalateDistinct(df: DataFrame): Boolean =
    escalate(df, DistinctEscalateBytesKey, Long.MaxValue)
}

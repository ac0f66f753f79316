package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling — the training-data staples
  * (train/val/test splits, per-source mixing "recipes", stable downsamples)
  * built on a cross-engine reproducible unit: the first 4 lowercase hex
  * chars of `md5(key as string)` compared against a precomputed hex
  * threshold (resolution 1/65536).
  *
  * Why not `rand(seed)` / `sampleBy`: Spark's random samplers draw
  * per-partition streams, so membership depends on the physical
  * partitioning — a repartition silently changes the sample. Hash
  * sampling is a pure per-row function of the KEY: stable across runs,
  * layouts, engines (any md5 implementation agrees), and growing corpora
  * (a doc's split never changes when neighbors arrive — the property
  * leakage audits rely on).
  *
  * All pure codegen'd column expressions; scan-speed at 100 TB.
  */
object Sampling {

  /** first `n` lowercase hex chars of md5 of the key's string form */
  def hashHex(key: Column, n: Int = 4): Column =
    substring(md5(key.cast("string").cast("binary")), 1, n)

  /** rate mapped to integer 1/65536 units; 65536 means "everything" and
    * must NEVER be hex-formatted — `f"%04x"` renders it as the 5-char
    * "10000", which compares lexicographically BELOW every 4-hex hash and
    * silently empties the bucket (rates in [65535.5/65536, 1.0] all round
    * here)
    */
  private def thresholdUnits(rate: Double): Long =
    math.round(rate * 65536.0)

  private def belowThreshold(h: Column, units: Long): Column =
    if (units >= 65536L) lit(true)
    else if (units <= 0L) lit(false)
    else h < lit(f"$units%04x")

  /** deterministic membership test at ≈`rate` (4-hex resolution) */
  def hashSample(key: Column, rate: Double): Column =
    belowThreshold(hashHex(key), thresholdUnits(rate))

  /** the DuckDB/ANSI twin of [[hashSample]]'s predicate, for oracle SQL */
  def hashSampleSql(keyExpr: String, rate: Double): String = {
    val units = thresholdUnits(rate)
    if (units >= 65536L) "true"
    else if (units <= 0L) "false"
    else f"substr(md5(CAST($keyExpr AS VARCHAR)), 1, 4) < '$units%04x'"
  }

  /** deterministic train/val/test split label: train gets `trainFrac`,
    * val the next `valFrac`, test the rest — same label for the same key
    * forever, regardless of corpus growth or layout. Exhaustive splits
    * (trainFrac + valFrac == 1.0 ⇒ empty test, e.g. the classic 0.8/0.2)
    * are legal: the cumulative boundary saturates to always-true instead
    * of falling through to the next label.
    */
  def hashSplit(key: Column, trainFrac: Double, valFrac: Double): Column = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1.0)
    val h = hashHex(key)
    when(belowThreshold(h, thresholdUnits(trainFrac)), lit("train"))
      .when(belowThreshold(h, thresholdUnits(trainFrac + valFrac)), lit("val"))
      .otherwise(lit("test"))
  }

  /** Per-stratum mixing recipe: keep a row iff its key hash-samples at the
    * rate assigned to its stratum (source, lang, quality band, …) — the
    * "data recipe" step that turns corpus proportions into training
    * proportions. Unlisted strata use `defaultRate`.
    */
  def recipeSample(stratum: Column, key: Column, rates: Map[String, Double],
                   defaultRate: Double = 0.0): Column =
    rates.toSeq.sortBy(_._1).foldLeft(hashSample(key, defaultRate)) {
      case (acc, (value, rate)) =>
        when(stratum === value, hashSample(key, rate)).otherwise(acc)
    }
}

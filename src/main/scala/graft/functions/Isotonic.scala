package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EXACT weighted isotonic regression (pool-adjacent-violators) — the
  * calibration step that maps a raw model score to a monotone estimate of
  * P(label) (quality-classifier calibration, CTR calibration, conformal
  * screening thresholds). Public basis: Barlow et al. 1972 (the PAV
  * algorithm); Spark MLlib ships a float variant
  * (`ml.regression.IsotonicRegression`) whose fitted means are
  * partition-order-dependent doubles — this one is exact.
  *
  * Exactness discipline (the repo's §7.2 rule applied to a solver): y and
  * w are integers (quantize scores to micro-units first), a block's fitted
  * value is the rational Σwy / Σw, violations are decided by exact
  * cross-multiplication (BigInt — no overflow, no epsilon), and the
  * output is the gcd-reduced (num, den) pair. The fit is therefore a pure
  * function of the INPUT MULTISET — bit-identical across runs, layouts,
  * and partition counts, which a double-accumulating PAV cannot promise.
  *
  * Scale shape: PAV is inherently sequential in x, but calibration inputs
  * are SCORES — a bounded alphabet once quantized (basis points ⇒ ≤10⁴+1
  * distinct x). So: (1) frequency-reduce corpus → (x, Σwy, Σw) via one
  * two-phase agg (the ExactPercentile/q152 histogram discipline — the
  * only corpus-sized pass); (2) run exact PAV over the alphabet-sized
  * frame in a single bounded task; (3) broadcast the fitted step function
  * back onto the corpus. Executor memory never holds more than the
  * alphabet regardless of corpus size. For unbounded-alphabet inputs,
  * quantize first (same trade the repo documents for percentiles).
  */
object Isotonic {

  /** Fitted step function: one row per distinct x with the gcd-reduced
    * exact fitted rational.
    *
    * @param df   input rows
    * @param xCol integral score column (quantize doubles first)
    * @param yCol integral response (e.g. 0/1 labels, or micro-unit values)
    * @param wCol integral positive weight
    * @return (x, fit_num, fit_den) with fit_num/fit_den non-decreasing in
    *         x, den > 0, gcd(num, den) = 1
    */
  def fit(df: DataFrame, xCol: String, yCol: String, wCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val reduced = df
      .select(col(xCol).cast("long").as("x"),
        (col(yCol).cast("long") * col(wCol).cast("long")).as("wy"),
        col(wCol).cast("long").as("w"))
      .groupBy(col("x"))
      .agg(sum(col("wy")).as("swy"), sum(col("w")).as("sw"))
      // the alphabet-sized frame: one bounded task runs the sequential PAV
      .repartition(1)
      .sortWithinPartitions(col("x"))
      .as[(Long, Long, Long)]
    reduced.mapPartitions { it =>
      // stack of pooled blocks; pooling only merges, so the stack is
      // bounded by the alphabet
      final case class Block(xs: List[Long], swy: BigInt, sw: BigInt)
      var stack = List.empty[Block] // head = rightmost block
      it.foreach { case (x, swy, sw) =>
        var b = Block(List(x), BigInt(swy), BigInt(sw))
        // pool while the left neighbor's mean exceeds the new block's
        // (non-decreasing fit; exact cross-multiplied compare)
        while (stack.nonEmpty && stack.head.swy * b.sw > b.swy * stack.head.sw) {
          val l = stack.head
          stack = stack.tail
          b = Block(l.xs ::: b.xs, l.swy + b.swy, l.sw + b.sw)
        }
        stack = b :: stack
      }
      stack.reverseIterator.flatMap { b =>
        val g = b.swy.gcd(b.sw)
        val (num, den) =
          if (g == 0) (BigInt(0), BigInt(1)) else (b.swy / g, b.sw / g)
        b.xs.iterator.map(x => (x, num.longValue, den.longValue))
      }
    }.toDF("x", "fit_num", "fit_den")
      .withColumnRenamed("x", xCol)
  }

  /** Input rows with their calibrated value attached: the broadcast join
    * of [[fit]]'s alphabet-sized step function back onto the corpus.
    */
  def calibrate(df: DataFrame, xCol: String, yCol: String,
                wCol: String): DataFrame =
    df.join(broadcast(fit(df, xCol, yCol, wCol)), xCol)
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH banding for near-duplicate candidate generation at scale
  * (Broder, "On the resemblance and containment of documents", SEQUENCES
  * 1997; banding analysis per Leskovec/Rajaraman/Ullman, Mining of Massive
  * Datasets ch. 3 — both public literature).
  *
  * The exact within-block Jaccard join (q81) is quadratic per block; at
  * 100 TB the only viable shape is signature → band → bucket-join:
  * docs agreeing on ANY band become candidates, and only candidates get the
  * exact Jaccard check. All hashing is `md5` over `seed|token`, so the
  * pipeline is deterministic and reproducible in any engine with md5
  * (the DuckDB oracle for q85 replays it exactly).
  *
  * Scale properties:
  *  - signatures: one narrow pass, no shuffle (k mins folded per row).
  *  - candidates: one shuffle on band key; bucket sizes are bounded by
  *    collision probability, not corpus size. A pathological hot bucket
  *    (e.g. empty docs) is capped via `maxBucket` before pairing —
  *    the classic LSH skew guard.
  */
object MinHashLSH {

  /** distinct whitespace tokens of `textCol` */
  def tokens(textCol: Column): Column = array_distinct(split(textCol, " "))

  /** One minhash value: the lexicographic min of md5(seed|token). */
  def minhash(tok: Column, seed: Int): Column =
    array_min(transform(tok, t => md5(concat(lit(s"$seed|"), t))))

  /** Append k minhash columns mh_0..mh_{k-1}. */
  def withSignature(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val tok = tokens(col(textCol))
    (0 until k).foldLeft(docs.withColumn("__tok", tok)) { (df, i) =>
      df.withColumn(s"mh_$i", minhash(col("__tok"), i))
    }.drop("__tok")
  }

  /** Band keys: k minhashes in `bands` bands of k/bands rows each; the band
    * key is the band index + the concatenated minhashes of that band.
    */
  def bandKeys(k: Int, bands: Int): Seq[Column] = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val r = k / bands
    (0 until bands).map { b =>
      val cols = (b * r until (b + 1) * r).map(i => col(s"mh_$i"))
      concat_ws("|", lit(b.toString) +: cols: _*)
    }
  }

  /** Candidate near-duplicate pairs (id_a < id_b): docs sharing any band.
    *
    * Band keys are xxhash64-compressed (see [[candidatePairsRaw]]), so the
    * result may contain RARE phantom pairs from a 64-bit band-key collision
    * (odds ~n²/2⁶⁵ across n·bands keys). Callers that cannot tolerate a
    * false candidate must run an exact-verify step (the normal LSH pipeline
    * shape — e.g. the Jaccard filter in q85 / CurationPipeline.nearDedup);
    * the dedup here removes cross-band duplicates, not phantom collisions.
    *
    * @param maxBucket drop buckets larger than this before pairing (skew
    *                  guard; a bucket of size m yields m^2/2 pairs).
    */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 8, bands: Int = 4,
                     maxBucket: Int = 1000): DataFrame =
    candidatePairsRaw(docs, idCol, textCol, k, bands, maxBucket).distinct()

  /** Candidate pairs WITHOUT the cross-band dedup — a pair agreeing on m
    * bands appears m times. When a downstream exact-verify filter runs
    * anyway (the normal LSH pipeline), deduping AFTER that filter is much
    * cheaper: the filter output is small, while deduping here shuffles the
    * full candidate multiset.
    */
  def candidatePairsRaw(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 8, bands: Int = 4,
                        maxBucket: Int = 1000,
                        blockCols: Seq[String] = Nil): DataFrame = {
    // All k minhashes + band strings in ONE codegen'd pass per row
    // (graft.expressions.MinHashBands — replaces k interpreted
    // transform/array_min folds; band strings byte-identical to
    // bandKeys(withSignature(...)), pinned by MinHashLSHSpec).
    // Band keys are then join-compressed to xxhash64 longs: the bucket
    // join compares 8-byte keys instead of 60+-char md5 concatenations
    // (same buckets w.h.p.; a phantom collision pair is removed by the
    // caller's exact verify step, which every LSH pipeline has anyway).
    // Block columns are folded into the hash, so docs only collide within
    // their block — the blocked-LSH shape (e.g. near-dup within lang)
    // shares this one path.
    val banded = docs
      .select(col(idCol).as("id") +: blockCols.map(col)
        :+ explode(graft.expressions.MinHashBands.bandKeys(
          col(textCol), k, bands)).as("bandStr"): _*)
      .select(col("id") +: blockCols.map(col)
        :+ xxhash64(blockCols.map(col) :+ col("bandStr"): _*).as("band"): _*)
    // Skew guard as a two-phase count + ANTI join against the overflow
    // bands, NOT a Window over band. The window funneled the
    // pathological hot bucket — the exact case the guard exists for —
    // into ONE task's sort buffer before any row was filtered: a
    // spill-backed straggler that dominates wall-clock at scale. The
    // count's partial aggregation collapses the hot key map-side (one
    // row per partition reaches the shuffle) and the anti join's build
    // side holds only bands ABOVE the cap — near-empty on a healthy
    // corpus, so it broadcasts. Deliberate trade: the banded projection
    // is computed twice (count + probe), one extra LINEAR perfectly
    // parallel pass (measured +0.3-0.6 s/query at sf0.1) bought instead
    // of a single-task buffer of an uncapped bucket at 100 TB. Kept set
    // is identical to the oracle's QUALIFY semantics (band ∉ overflow ⇔
    // bucket_n ≤ cap; band keys are never null).
    val pruned = if (maxBucket == Int.MaxValue) banded else {
      val bigBuckets = banded.groupBy(col("band"))
        .agg(count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") > maxBucket)
        .select(col("band"))
      banded.join(bigBuckets, Seq("band"), "left_anti")
    }
    pruned.as("a")
      .join(pruned.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a") +: col("b.id").as("id_b")
        +: blockCols.map(c => col(s"a.$c")): _*)
  }
}

package graft.operators

import graft.functions.{Dedup, MinHashLSH, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the pipeline-orchestration layer the
  * north star asks for, composing the individual operators in the order a
  * real 100 TB curation funnel runs them — cheapest filters first so each
  * stage sees less data:
  *
  *   1. quality gate        (narrow projection — scan speed)
  *   2. exact dedup         (one shuffle on a digest)
  *   3. near-dup removal    (MinHash-LSH candidates + exact verify;
  *                           survivor = min doc id per dup cluster edge)
  *   4. annotate            (token counts, fingerprint, predicted lang)
  *
  * Every stage is a pure DataFrame→DataFrame function; `run` returns the
  * curated frame plus per-stage row counts for observability. Stats are
  * collected in a SINGLE execution of the expensive stages: the linear
  * prefix (scan → quality gate → exact dedup) is measured with
  * `Dataset.observe` metrics piggybacked on the one action that also
  * materializes the exact-dedup cache, and the LSH near-dedup output is
  * cached before its count — nothing upstream ever re-executes
  * (`collectStats=false` skips all actions and caching, staying fully
  * lazy).
  */
object CurationPipeline {

  case class Config(
      idCol: String = "doc_id",
      textCol: String = "text",
      minQuality: Double = 0.5,
      stopwords: Seq[String] = Seq("join", "filter", "scan"),
      nearDupJaccard: Double = 0.9,
      minhashK: Int = 8,
      minhashBands: Int = 4,
      maxBucket: Int = 1000)

  /** `release()` unpersists the near-dedup cache that `curated` reads from
    * (collectStats=true only; a no-op otherwise) — call it once the curated
    * output has been materialized/written, so long-lived sessions don't
    * accumulate cached DataFrames across pipeline invocations. Dropping the
    * cache before materializing is safe too: the frame recomputes.
    */
  case class Result(curated: DataFrame, stats: Map[String, Long],
                    release: () => Unit = () => ())

  def qualityGate(docs: DataFrame, cfg: Config): DataFrame =
    docs.filter(TextFunctions.qualityScore(col(cfg.textCol), cfg.stopwords)
      >= cfg.minQuality)

  def exactDedup(docs: DataFrame, cfg: Config): DataFrame =
    Dedup.exact(docs, cfg.idCol, Seq(cfg.textCol))

  /** Drop near-duplicates: LSH candidates verified by exact Jaccard; for
    * every verified pair the larger id loses (deterministic survivor rule,
    * transitively keeps at least one doc per duplicate cluster).
    */
  def nearDedup(docs: DataFrame, cfg: Config): DataFrame = {
    val tok = docs.select(col(cfg.idCol).as("__id"),
      Dedup.tokenIds(col(cfg.textCol)).as("__tok"))
    val losers = MinHashLSH.candidatePairsRaw(docs, cfg.idCol, cfg.textCol,
        cfg.minhashK, cfg.minhashBands, cfg.maxBucket)
      .join(tok.select(col("__id").as("id_a"), col("__tok").as("tok_a")), "id_a")
      .join(tok.select(col("__id").as("id_b"), col("__tok").as("tok_b")), "id_b")
      .filter(Dedup.jaccardSortedIds(col("tok_a"), col("tok_b"))
        >= cfg.nearDupJaccard)
      .select(col("id_b").as(cfg.idCol))   // id_a < id_b: larger id loses
      .distinct()
    docs.join(losers, Seq(cfg.idCol), "left_anti")
  }

  def annotate(docs: DataFrame, cfg: Config): DataFrame =
    docs
      .withColumn("n_tokens", TextFunctions.tokenCountWs(col(cfg.textCol)))
      .withColumn("quality",
        TextFunctions.qualityScore(col(cfg.textCol), cfg.stopwords))
      .withColumn("fingerprint", TextFunctions.fingerprint(col(cfg.textCol)))

  def run(docs: DataFrame, cfg: Config = Config(),
          collectStats: Boolean = true): Result = {
    if (!collectStats) {
      val out = annotate(nearDedup(exactDedup(qualityGate(docs, cfg), cfg), cfg), cfg)
      return Result(out, Map.empty)
    }
    // single-execution stats: observe() metrics ride along the one action
    // that materializes the exact-dedup cache, so the scan→gate→dedup
    // prefix runs exactly once; nearDedup then reads `exact` from cache in
    // all three of its branches (candidates, token join, anti-join)
    val obsInput = org.apache.spark.sql.Observation()
    val obsGated = org.apache.spark.sql.Observation()
    val gated = qualityGate(
      docs.observe(obsInput, count(lit(1)).as("n")), cfg)
      .observe(obsGated, count(lit(1)).as("n"))
    val exact = exactDedup(gated, cfg).cache()
    val nExact = exact.count()                 // action #1: fills the cache
    val near = nearDedup(exact, cfg).cache()
    val nNear = near.count()                   // action #2: LSH runs once
    exact.unpersist()
    val out = annotate(near, cfg)
    Result(out, Map(
      "input" -> obsInput.get("n").asInstanceOf[Long],
      "after_quality" -> obsGated.get("n").asInstanceOf[Long],
      "after_exact_dedup" -> nExact,
      "after_near_dedup" -> nNear),
      release = () => { near.unpersist(false); () })
  }
}

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
  * curated frame plus per-stage row counts for observability (counts are
  * actions — at production scale you'd sample or read them from the final
  * write's metrics instead; `collectStats=false` skips them).
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

  case class Result(curated: DataFrame, stats: Map[String, Long])

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
    val gated = qualityGate(docs, cfg)
    val exact = exactDedup(gated, cfg)
    val near = nearDedup(exact, cfg)
    val out = annotate(near, cfg)
    val stats =
      if (!collectStats) Map.empty[String, Long]
      else Map(
        "input" -> docs.count(),
        "after_quality" -> gated.count(),
        "after_exact_dedup" -> exact.count(),
        "after_near_dedup" -> near.count())
    Result(out, stats)
  }
}

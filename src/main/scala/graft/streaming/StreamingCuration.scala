package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The curation funnel's STREAMING twin — incremental corpus ingestion
  * (a live crawl feed) through the same stages the batch pipeline
  * (`operators/CurationPipeline`, q97) runs: cheapest-first quality gate,
  * PII scrub, then exact near-dup suppression keyed on the scrubbed-text
  * digest with `dropDuplicatesWithinWatermark` — state is evicted as the
  * watermark passes, so dedup memory is bounded by the watermark horizon
  * instead of the corpus (the batch-vs-stream state tradeoff: a doc
  * re-arriving AFTER the horizon is kept again; cross-horizon dedup is
  * the batch job's responsibility, e.g. `Dedup.incrementalNearDedup`).
  *
  * Works identically on a batch frame (dropDuplicates fallback) — the
  * twin-equivalence contract the streaming tier tests everywhere else.
  * Combine with [[IdempotentSink.parquetExactlyOnce]] for end-to-end
  * exactly-once ingestion.
  */
object StreamingCuration {

  val DefaultStopwords: Seq[String] = Seq("join", "filter", "scan")

  /** @param docs (doc_id, text, ts, ...) — streaming or batch
    * @return surviving docs with `quality` attached and `text` scrubbed */
  def run(docs: DataFrame, minQuality: Double = 0.5,
          watermark: String = "1 hour",
          stopwords: Seq[String] = DefaultStopwords): DataFrame = {
    val gated = docs
      .withColumn("quality",
        TextFunctions.qualityScore(col("text"), stopwords))
      .filter(col("quality") >= minQuality)
      .withColumn("text", TextFunctions.scrubPii(col("text")))
      .withColumn("__digest", md5(col("text")))
    val deduped =
      if (docs.isStreaming)
        gated.withWatermark("ts", watermark)
          .dropDuplicatesWithinWatermark("__digest")
      else gated.dropDuplicates("__digest")
    deduped.drop("__digest")
  }
}

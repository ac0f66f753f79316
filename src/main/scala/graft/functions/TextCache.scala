package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import scala.collection.concurrent.TrieMap

/** Shared tokenization cache for the text tier (SURVEY §7.6 headroom 1).
  *
  * Every text-pipeline query starts from the same derivations of
  * `documents.text` — the base scan, the interned (xxhash64) distinct token
  * ids, the interned word-n-gram ids. This object computes each form ONCE
  * per (session, sf dir) and caches it, so a session running many text
  * operators tokenizes the corpus a single time.
  *
  * 100 TB shape: this is the in-session analog of the standard
  * tokenize-once materialization — a real pipeline writes the tokenized /
  * interned corpus to columnar storage up front (one scan of the raw text,
  * ever) and every downstream stage reads the materialized form. Locally
  * the materialization is a `persist(MEMORY_AND_DISK)` — same dataflow,
  * spill-safe, no driver memory involved. Values are identical with or
  * without the cache (it memoizes plans, it does not change them), so
  * hash-checked oracle parity is untouched.
  *
  * MEASURED (round 4, sf0.1 at local[32]) and deliberately NOT wired into
  * the declared bench queries: at fixture scale the cached-columnar read
  * path (InMemoryTableScan of array columns + the codegen boundary it
  * introduces) costs MORE than recomputing the codegen'd ShingleIds/split
  * over parquet strings — q85 1.21→1.38 s, q86 1.27→1.58 s, q92
  * 1.06→1.27 s, q97 1.90→2.55 s with the cache; nothing improved. The
  * crossover favors the cache only when derivation cost ≫ cached-read
  * cost — i.e. heavyweight tokenizers (real BPE, normalizers) or a corpus
  * large enough that the raw-text scan dominates. Use it there; measure,
  * don't guess.
  */
object TextCache {

  // keyed by the session object itself (not a UUID) so two sessions never
  // share a cached plan; the map only ever holds a handful of small frames.
  // Entries are evicted automatically when the owning SparkContext ends
  // (listener below) — without that, a long-lived JVM churning sessions
  // would pin every dead session's DataFrames (and persisted blocks) via
  // these strong references unless callers remembered release(spark).
  private val forms =
    TrieMap.empty[(SparkSession, String, String), DataFrame]

  private val hookedContexts =
    TrieMap.empty[org.apache.spark.SparkContext, Unit]

  private def hookCleanup(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    hookedContexts.getOrElseUpdate(sc, {
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          forms.keys.filter(_._1.sparkContext eq sc)
            .foreach(forms.remove)
          hookedContexts.remove(sc)
        }
      })
    })
  }

  private def getOrPersist(spark: SparkSession, sfDir: String, form: String)(
      build: => DataFrame): DataFrame = {
    hookCleanup(spark)
    forms.getOrElseUpdate((spark, sfDir, form),
      build.persist(StorageLevel.MEMORY_AND_DISK))
  }

  /** The documents table, scanned and decoded once per session+sf. */
  def base(spark: SparkSession, sfDir: String): DataFrame =
    getOrPersist(spark, sfDir, "base")(Tables.documents(spark, sfDir))

  /** (doc_id, lang, tok): sorted distinct xxhash64 token ids — the interned
    * form consumed by the Jaccard verify loops (q81/q85/q94).
    */
  def tokenIds(spark: SparkSession, sfDir: String): DataFrame =
    getOrPersist(spark, sfDir, "tok")(
      base(spark, sfDir).select(col("doc_id"), col("lang"),
        Dedup.tokenIds(col("text")).as("tok")))

  /** (doc_id, lang, g): sorted distinct xxhash64 word-n-gram ids (empty for
    * docs shorter than n tokens) — the interned shingle form (q86).
    */
  def gramIds(spark: SparkSession, sfDir: String, n: Int): DataFrame =
    getOrPersist(spark, sfDir, s"gram$n")(
      base(spark, sfDir).select(col("doc_id"), col("lang"),
        Dedup.gramIds(col("text"), n).as("g")))

  /** Generic memoized form for derivations whose cost dwarfs their
    * cached-read cost — the documented crossover case above. The pair /
    * cluster tier is the canonical example: an LSH+verify+connected-
    * components pass over the whole corpus reduces to a few thousand
    * (id, component) rows, so every consumer after the first reads a tiny
    * cached table instead of re-running the most expensive pipeline in the
    * engine. Names share the namespace of the built-in forms — pick unique
    * ones.
    */
  def form(spark: SparkSession, sfDir: String, name: String)(
      build: => DataFrame): DataFrame =
    getOrPersist(spark, sfDir, name)(build)

  /** Unpersist and forget every cached form belonging to `spark`. */
  def release(spark: SparkSession): Unit =
    forms.keys.filter(_._1 eq spark).foreach { k =>
      forms.remove(k).foreach(_.unpersist(false))
    }
}

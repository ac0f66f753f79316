package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TextCacheSpec extends SparkSpec {

  test("cached forms equal their uncached derivations (values, not plans)") {
    val base = TextCache.base(spark, sfDir)
    assert(base.orderBy("doc_id").collect().toSeq ==
      Tables.documents(spark, sfDir).orderBy("doc_id").collect().toSeq)
    val tok = TextCache.tokenIds(spark, sfDir)
    val tokFresh = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), Dedup.tokenIds(col("text")).as("tok"))
    assert(tok.orderBy("doc_id").collect().toSeq ==
      tokFresh.orderBy("doc_id").collect().toSeq)
    val g = TextCache.gramIds(spark, sfDir, 3)
    val gFresh = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), Dedup.gramIds(col("text"), 3).as("g"))
    assert(g.orderBy("doc_id").collect().toSeq ==
      gFresh.orderBy("doc_id").collect().toSeq)
  }

  test("forms are memoized per (session, sfDir): same frame comes back") {
    assert(TextCache.base(spark, sfDir) eq TextCache.base(spark, sfDir))
    assert(TextCache.tokenIds(spark, sfDir) eq TextCache.tokenIds(spark, sfDir))
    assert(TextCache.gramIds(spark, sfDir, 3) eq
      TextCache.gramIds(spark, sfDir, 3))
    // different n is a different form
    assert(!(TextCache.gramIds(spark, sfDir, 3) eq
      TextCache.gramIds(spark, sfDir, 2)))
  }

  test("forms are file-backed artifacts: sweep-immune, released on demand") {
    val tok = TextCache.tokenIds(spark, sfDir)
    val n = tok.count()
    assert(n > 0)
    // materialization must NOT depend on session cache state: a harness
    // sweep between queries (Checkpoints.sweep clears the plan cache and
    // every persistent RDD) leaves the artifact read path untouched —
    // the exact failure mode that cost q100 a 10x regression when the
    // forms were persist()-backed
    graft.functions.Checkpoints.sweep(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    assert(TextCache.tokenIds(spark, sfDir).count() == n)
    // the memoized reader scans parquet files, not an in-memory relation
    val files = tok.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("graft-textcache")),
      s"expected materialized textcache files, got ${files.take(2).toSeq}")
    // base is deliberately NOT materialized: the source is already a
    // parquet scan, so a copy would buy nothing (review finding)
    assert(TextCache.base(spark, sfDir).inputFiles
      .forall(!_.contains("graft-textcache")))
    TextCache.release(spark)
    // files are gone after release...
    assert(!new java.io.File(new java.net.URI(files.head).getPath).exists())
    // ...and the form rebuilds transparently on next access
    assert(TextCache.tokenIds(spark, sfDir).count() == n)
    TextCache.release(spark)
  }
}

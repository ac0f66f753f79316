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

  test("release() unpersists every form owned by the session") {
    val sc = spark.sparkContext
    TextCache.base(spark, sfDir).count()
    TextCache.tokenIds(spark, sfDir).count()
    assert(sc.getPersistentRDDs.nonEmpty)
    val ours = sc.getPersistentRDDs.size
    TextCache.release(spark)
    assert(sc.getPersistentRDDs.size < ours,
      "release() left the text-cache forms resident")
    // cache rebuilds transparently after release
    assert(TextCache.base(spark, sfDir).count() > 0)
    TextCache.release(spark)
  }
}

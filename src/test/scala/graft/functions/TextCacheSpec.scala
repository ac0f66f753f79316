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

  test("shared tier: two sessions, ONE build (fingerprint-keyed artifact " +
    "reused across sessions)") {
    val shared = java.nio.file.Files
      .createTempDirectory("graft-sharedtest-").toString
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def mk(s: org.apache.spark.sql.SparkSession) = {
      builds.incrementAndGet()
      s.range(5).selectExpr("id", "id * id AS sq")
    }
    val s1 = spark.newSession(); val s2 = spark.newSession()
    Seq(s1, s2).foreach(_.conf.set(TextCache.SharedDirConfKey, shared))
    val a = TextCache.form(s1, sfDir, "spec-shared-a")(mk(s1))
    assert(builds.get() == 1)
    assert(a.inputFiles.forall(_.contains("graft-textcache-shared")))
    // the SECOND SESSION reads the completed artifact — no rebuild
    val b = TextCache.form(s2, sfDir, "spec-shared-a")(mk(s2))
    assert(builds.get() == 1, "second session rebuilt a shared artifact")
    assert(b.orderBy("id").collect().toSeq == a.orderBy("id").collect().toSeq)
  }

  test("shared tier: the corpus fingerprint tracks content — a changed " +
    "file re-keys the artifacts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fptest-")
    val f = dir.resolve("part.txt")
    java.nio.file.Files.writeString(f, "alpha")
    val fp1 = TextCache.corpusFingerprint(spark, dir.toString)
    java.nio.file.Files.writeString(f, "alpha beta") // longer file
    val fp2 = TextCache.corpusFingerprint(spark, dir.toString)
    assert(fp1 != fp2, "fingerprint missed a content change")
    // unchanged content -> stable key
    assert(fp2 == TextCache.corpusFingerprint(spark, dir.toString))
  }

  test("shared tier: a held lock falls back to a session-local build " +
    "after the wait (correct result, loud note, no indefinite wait)") {
    val shared = java.nio.file.Files
      .createTempDirectory("graft-sharedtest-").toString
    val s = spark.newSession()
    s.conf.set(TextCache.SharedDirConfKey, shared)
    s.conf.set(TextCache.SharedWaitMsKey, "1")
    // strand a lock where the builder would take it (layout: see
    // SharedDirConfKey scaladoc; -v1 = current FormLayoutVersion)
    val fp = TextCache.corpusFingerprint(s, sfDir)
    val lock = new java.io.File(
      s"$shared/graft-textcache-shared/$fp/spec-shared-b-v1.lock")
    lock.getParentFile.mkdirs()
    assert(lock.createNewFile())
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val df = TextCache.form(s, sfDir, "spec-shared-b") {
      builds.incrementAndGet()
      s.range(3).selectExpr("id")
    }
    assert(builds.get() == 1, "fallback build did not run")
    assert(df.count() == 3)
    // the fallback landed session-local, NOT in the shared layout
    assert(df.inputFiles.forall(!_.contains("graft-textcache-shared")))
    assert(!new java.io.File(
      s"$shared/graft-textcache-shared/$fp/spec-shared-b-v1").exists())
  }
}

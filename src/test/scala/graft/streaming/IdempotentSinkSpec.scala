package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class IdempotentSinkSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_sink").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  test("streaming foreachBatch sink delivers each row exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val path = freshDir()
    val mem = MemoryStream[Ev]
    val q = mem.toDF().writeStream
      .foreachBatch(IdempotentSink.parquetExactlyOnce(path) _)
      .start()
    try {
      mem.addData(Ev(1, t("2024-01-01 00:00:00"), 1, "click", 1.0, "{}"),
        Ev(2, t("2024-01-01 00:01:00"), 1, "view", 2.0, "{}"))
      q.processAllAvailable()
      mem.addData(Ev(3, t("2024-01-01 00:02:00"), 2, "click", 3.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    assert(IdempotentSink.committedBatches(spark, path) == Seq(0L, 1L))
    val out = IdempotentSink.committedRead(spark, path)
    assert(out.select("event_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("a replayed batchId overwrites, never duplicates (engine retry contract)") {
    val path = freshDir()
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    IdempotentSink.parquetExactlyOnce(path)(b0, 0L)
    // failure-replay: same batchId arrives again (possibly recomputed)
    IdempotentSink.parquetExactlyOnce(path)(b0, 0L)
    val out = IdempotentSink.committedRead(spark, path)
    assert(out.count() == 2)
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("replay of an already-committed batch is a no-op (committed data is final)") {
    val path = freshDir()
    IdempotentSink.parquetExactlyOnce(path)(Seq((1L, "a")).toDF("id", "v"), 0L)
    // crash AFTER the marker write but BEFORE the checkpoint advanced:
    // the engine re-runs batch 0, possibly with recomputed (different!)
    // data. The committed directory must not be rewritten — a concurrent
    // committedRead would otherwise observe a half-rewritten batch.
    IdempotentSink.parquetExactlyOnce(path)(Seq((99L, "ghost")).toDF("id", "v"), 0L)
    val out = IdempotentSink.committedRead(spark, path)
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("a crash during the staged write leaves the batch invisible; " +
    "the retry overwrites the staging debris and publishes its own data") {
    val path = freshDir()
    IdempotentSink.parquetExactlyOnce(path)(Seq((1L, "a")).toDF("id", "v"), 0L)
    // simulate the crash: STAGING dir exists (the only place a partial
    // write can ever live under the stage->rename protocol), no final
    // dir, no marker
    Seq((99L, "ghost")).toDF("id", "v")
      .write.parquet(s"$path/.inflight/batch=1")
    assert(IdempotentSink.committedBatches(spark, path) == Seq(0L))
    val out = IdempotentSink.committedRead(spark, path)
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L))
    // the hidden staging dir is also invisible to a batch=* glob (what a
    // downstream streaming file source lists)
    assert(spark.read.option("basePath", path)
      .parquet(s"$path/batch=*").count() == 1)
    // the retry overwrites the staging debris, publishes, commits
    IdempotentSink.parquetExactlyOnce(path)(Seq((3L, "c")).toDF("id", "v"), 1L)
    assert(IdempotentSink.committedRead(spark, path)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // no staging leftovers after a successful publish
    assert(!new java.io.File(s"$path/.inflight/batch=1").exists())
  }

  test("a crash between the atomic publish and the marker: the published " +
    "directory is complete by construction — the retry only adds the " +
    "marker, never rewrites (a rewrite would expose a delete-then-" +
    "reappear window to a downstream file source)") {
    val path = freshDir()
    // publish batch 0 fully, then simulate the crash by deleting the
    // marker: final dir present (complete), commit absent
    IdempotentSink.parquetExactlyOnce(path)(Seq((1L, "a")).toDF("id", "v"), 0L)
    assert(new java.io.File(s"$path/_commits/0").delete())
    assert(IdempotentSink.committedBatches(spark, path).isEmpty)
    // engine replays batch 0 (same offsets => same rows in production;
    // a ghost payload here PROVES the no-rewrite behavior)
    IdempotentSink.parquetExactlyOnce(path)(
      Seq((99L, "ghost")).toDF("id", "v"), 0L)
    assert(IdempotentSink.committedBatches(spark, path) == Seq(0L))
    assert(IdempotentSink.committedRead(spark, path)
      .select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("an unmarked batch dir WITHOUT _SUCCESS is partial debris (legacy " +
    "direct-write crash or torn object-store rename) — the retry deletes " +
    "and republishes instead of committing the partial batch as-is") {
    val path = freshDir()
    // simulate the pre-round-12 protocol's crash state: part files
    // landed directly in batch=0, job never committed (no _SUCCESS),
    // no marker
    val dir = new java.io.File(s"$path/batch=0")
    assert(dir.mkdirs())
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/batch=0/part-00000-junk.parquet"),
      "not a parquet footer")
    // the retry must NOT trust the debris (the old exists()-only check
    // would have committed the junk permanently — round-12 review)
    IdempotentSink.parquetExactlyOnce(path)(Seq((1L, "a")).toDF("id", "v"), 0L)
    assert(IdempotentSink.committedBatches(spark, path) == Seq(0L))
    assert(IdempotentSink.committedRead(spark, path)
      .select("id").as[Long].collect().toSeq == Seq(1L))
    assert(!new java.io.File(s"$path/batch=0/part-00000-junk.parquet")
      .exists())
    // and the republished dir carries the completeness probe
    assert(new java.io.File(s"$path/batch=0/_SUCCESS").exists())
  }
}

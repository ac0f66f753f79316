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

  test("a crash between write and commit leaves the batch invisible") {
    val path = freshDir()
    IdempotentSink.parquetExactlyOnce(path)(Seq((1L, "a")).toDF("id", "v"), 0L)
    // simulate the crash: batch dir exists, no commit marker
    Seq((99L, "ghost")).toDF("id", "v")
      .write.parquet(s"$path/batch=1")
    assert(IdempotentSink.committedBatches(spark, path) == Seq(0L))
    val out = IdempotentSink.committedRead(spark, path)
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L))
    // the retry then overwrites the orphan and commits it
    IdempotentSink.parquetExactlyOnce(path)(Seq((3L, "c")).toDF("id", "v"), 1L)
    assert(IdempotentSink.committedRead(spark, path)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }
}

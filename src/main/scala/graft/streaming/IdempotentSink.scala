package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Exactly-once parquet sink for `foreachBatch` — the production answer to
  * Structured Streaming's at-least-once batch replay: after a failure the
  * engine re-runs the LAST micro-batch with the SAME batchId, so a naive
  * append sink duplicates it.
  *
  * Protocol (stage → atomic publish → marker):
  *  1. data for batch b is written to a hidden staging directory
  *     `path/.inflight/batch=b` (dot-prefixed: invisible to Spark file
  *     listings and to any `batch=*` glob) with mode=Overwrite — a
  *     retried batch rewrites the stage instead of appending a copy;
  *  2. the staged directory is RENAMEd to `path/batch=b` — one atomic
  *     filesystem operation, so the batch directory appears to every
  *     reader all-at-once or not at all;
  *  3. only after the publish, an empty marker `path/_commits/b` is
  *     created. `committedRead` unions exactly the marked directories.
  *
  * Why the rename step exists (round 12, found by the executor-kill
  * streaming chaos gate `StreamChaos`): the original two-step protocol
  * wrote part files DIRECTLY into `path/batch=b`, which is safe for
  * `committedRead`ers but not for the documented production layout of a
  * downstream streaming FILE SOURCE over `path/batch=*` — a source
  * listing the glob mid-write sees a PARTIAL batch (whichever part files
  * the committer had moved so far), processes those rows in an earlier
  * trigger than the rest, and order-sensitive stateful consumers
  * downstream (the funnel's per-bucket LSH rejection) pick different
  * winners than the batch engine (measured: 187 of 4000 near-dup pairs
  * flipped at 40k docs). With the atomic rename no reader can observe a
  * half-published directory, streaming or batch.
  *
  * Crash matrix: before the rename → only hidden staging debris, invisible
  * to everyone, overwritten by the retry; between rename and marker → the
  * batch dir carries the staged write's job-commit `_SUCCESS` marker,
  * proving it the COMPLETE output of the batch, so the retry publishes
  * just the missing commit marker — rewriting a complete dir would
  * instead expose a delete-then-reappear window in which a file source
  * double-reads differently-named part files; after the marker → full
  * no-op. A pre-existing batch dir WITHOUT `_SUCCESS` is partial debris
  * this protocol never published (an upgrade from the pre-round-12
  * direct-write layout, or a torn rename on a store without atomic
  * rename) and is deleted + republished rather than trusted.
  *
  * Filesystem contract: step 2 relies on atomic directory rename —
  * true on HDFS and posix filesystems. On S3-style object stores
  * (rename = copy+delete) front this sink with a rename-atomic layer
  * (HBOSS, or an Iceberg/Delta table as the hop) — the `_SUCCESS`
  * completeness probe above then still catches any torn publish.
  *
  * At 100 TB this is also the right layout: each micro-batch is an
  * independently-committed partition directory, so downstream backfills
  * and compactions operate per-batch without reader coordination.
  */
object IdempotentSink {

  /** the foreachBatch function: `stream.writeStream.foreachBatch(
    * IdempotentSink.parquetExactlyOnce(path) _)`
    *
    * Replay of an ALREADY-COMMITTED batch (crash after the marker write but
    * before the checkpoint advanced) is a no-op: once the marker exists the
    * batch directory is visible to concurrent `committedRead`ers and final
    * by construction — rewriting it would momentarily expose a half-written
    * directory the protocol otherwise guarantees can't be observed.
    */
  def parquetExactlyOnce(path: String)(df: DataFrame, batchId: Long): Unit = {
    if (!isCommitted(df.sparkSession, path, batchId)) {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      val finalDir = new org.apache.hadoop.fs.Path(s"$path/batch=$batchId")
      def stageAndPublish(): Unit = {
        val staging =
          new org.apache.hadoop.fs.Path(s"$path/.inflight/batch=$batchId")
        df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
        fs.mkdirs(finalDir.getParent)
        if (!fs.rename(staging, finalDir))
          throw new java.io.IOException(
            s"IdempotentSink: publish rename $staging -> $finalDir failed")
      }
      val success =
        new org.apache.hadoop.fs.Path(finalDir, "_SUCCESS")
      if (!fs.exists(finalDir)) stageAndPublish()
      else if (!fs.exists(success)) {
        // An unmarked batch dir WITHOUT the job-commit marker was never
        // published by this protocol's rename (the staged write puts
        // _SUCCESS inside the dir before the rename moves it whole): it
        // is partial debris — a crash of the old direct-write protocol,
        // or a non-atomic rename on an object store. Trusting it would
        // commit a partial batch permanently (round-12 review). No
        // correct reader can have consumed it as complete (committedRead
        // requires the marker; a file source saw at most these same
        // partial files), so delete and republish atomically.
        fs.delete(finalDir, true)
        stageAndPublish()
      }
      // else: a previous attempt crashed between publish and marker — the
      // dir carries the staged write's _SUCCESS, i.e. the COMPLETE output
      // of the batch; just finish the commit. (If
      // mapreduce.fileoutputcommitter.marksuccessfuljobs is disabled the
      // complete dir is indistinguishable from debris and gets
      // republished — correct, just non-minimal.)
      commit(df.sparkSession, path, batchId)
    }
  }

  private def isCommitted(spark: SparkSession, path: String,
                          batchId: Long): Boolean = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(s"$path/_commits/$batchId"))
  }

  private def commit(spark: SparkSession, path: String, batchId: Long): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$path/_commits/$batchId")
    fs.mkdirs(marker.getParent)
    val out = fs.create(marker, true)
    out.close()
  }

  /** ids of committed batches under `path` (empty when nothing committed) */
  def committedBatches(spark: SparkSession, path: String): Seq[Long] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(s"$path/_commits")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName.toLong).sorted
  }

  /** read exactly the committed batches — uncommitted (crashed mid-write)
    * directories are invisible
    */
  def committedRead(spark: SparkSession, path: String): DataFrame = {
    val ids = committedBatches(spark, path)
    require(ids.nonEmpty, s"no committed batches under $path")
    spark.read
      .option("basePath", path)
      .parquet(ids.map(b => s"$path/batch=$b"): _*)
      .drop(col("batch"))
  }
}

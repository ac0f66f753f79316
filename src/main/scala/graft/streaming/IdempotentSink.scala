package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Exactly-once parquet sink for `foreachBatch` — the production answer to
  * Structured Streaming's at-least-once batch replay: after a failure the
  * engine re-runs the LAST micro-batch with the SAME batchId, so a naive
  * append sink duplicates it.
  *
  * Protocol (the classic two-step commit):
  *  1. data for batch b lands in a batchId-deterministic directory
  *     `path/batch=b` with mode=Overwrite — a retried batch rewrites the
  *     same directory instead of appending a second copy;
  *  2. only after the write succeeds, an empty marker `path/_commits/b`
  *     is created. Readers union exactly the marked directories, so a
  *     crash BETWEEN steps leaves an invisible (and next-retry-overwritten)
  *     directory, never a half-visible one.
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
      df.write.mode(SaveMode.Overwrite).parquet(s"$path/batch=$batchId")
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

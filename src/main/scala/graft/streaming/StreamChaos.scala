package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import java.sql.Timestamp

/** One input row of the chaos corpus (top-level so the product encoder
  * and the file-source schema are derivable on executors). */
case class ChaosDoc(doc_id: Long, ts: Timestamp, text: String)

/** Streaming executor-loss chaos gate (round 12, VERDICT item 5): run the
  * q97 curation funnel's STREAMING twin — quality gate + watermarked exact
  * dedup → exactly-once parquet hop → file-source stage 2 with the
  * stateful per-bucket LSH rejection (`flatMapGroupsWithState`) — on a
  * local-cluster master, and SIGKILL a live executor JVM **while a
  * stage-2 micro-batch is executing** (the killer thread polls
  * `query.status` and fires only when a trigger is actively processing,
  * so the kill provably lands mid-batch, inside the fMGWS stage). The
  * state store must recover from the checkpoint on the replacement
  * executor, retried tasks must not double-write (IdempotentSink), and
  * the surviving corpus must equal the BATCH CurationPipeline's on the
  * same docs.
  *
  * Round 9 proved driver-side crash-restart of stage 2; the round-11
  * executor-kill gate covered the iterative BATCH tier. This main covers
  * the remaining axis: executor loss during stateful streaming.
  *
  * Kills are counted in-process (ProcessHandle.destroyForcibly on a
  * CoarseGrainedExecutorBackend child of THIS JVM — local-cluster
  * executors are forked children of the driver), so the gate cannot pass
  * vacuously: zero landed kills is a FAILURE (the ADVICE r11 lesson from
  * the pgrep-based batch killer).
  *
  * Survivor comparison is by md5(text), not doc_id: which twin of an
  * exact-duplicate pair survives stage-1 dedup is layout-dependent
  * (dropDuplicatesWithinWatermark keeps the first row it meets), but the
  * twins' TEXT is identical by construction, the corpus is built so
  * exact-dup classes never participate in near-dup relations, and the
  * batch engine dedups the same way — so the surviving text multiset is
  * the deterministic contract.
  *
  * Usage (one command): tools/stream_chaos_test.sh
  * Env: SPARK_GRAFT_MASTER / SPARK_GRAFT_JARS / SPARK_GRAFT_EXEC_MEM /
  *      SPARK_GRAFT_CPUS as in Verify; SPARK_GRAFT_CHAOS_DOCS to resize
  *      the corpus (default 40000 — sized so a stage-2 micro-batch runs
  *      multiple seconds under local-cluster, wide enough to straddle a
  *      kill).
  */
object StreamChaos {

  /** Deterministic synthetic corpus: per index i (0-based),
    *   - i % 10 == 7 → EXACT duplicate of doc i-1 (a unique doc),
    *   - i % 10 == 8 → NEAR duplicate of doc i-3 (a unique doc): its
    *     last token replaced by a fresh one → 19 shared of 21 distinct,
    *     Jaccard ≈ 0.905, just over the 0.9 funnel threshold (drop-one-
    *     add-TWO was measured at 19/22 ≈ 0.864 — silently under the
    *     threshold, zero rejects, a vacuous rejection path),
    *   - i % 10 == 9 → quality-gate junk (stopword-laden),
    *   - else        → unique doc over a disjoint token range (no
    *     cross-doc shingle overlap, so LSH buckets hold only true pairs).
    * Timestamps ascend by a minute per doc — arrivals are in-order, well
    * inside the 1 h dedup watermark for every dup pair (±3 ids apart).
    */
  def mkDocs(n: Int): IndexedSeq[ChaosDoc] = {
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def uniqueText(i: Int): String =
      (i * 30 until i * 30 + 20).map(t => f"tok$t%07d").mkString(" ")
    (0 until n).map { i =>
      val text = (i % 10: @unchecked) match {
        case 7 => uniqueText(i - 1)
        case 8 =>
          val toks = (i - 3) * 30 until (i - 3) * 30 + 20
          (toks.dropRight(1).map(t => f"tok$t%07d") :+ f"chg$i%07d")
            .mkString(" ")
        case 9 => "join join join scan filter !!!"
        case _ => uniqueText(i)
      }
      ChaosDoc(i.toLong, new Timestamp(base + i * 60000L), text)
    }
  }

  /** SIGKILL one live executor JVM forked under this driver. */
  def killOneExecutor(): Option[Long] = {
    import scala.jdk.CollectionConverters._
    ProcessHandle.current().descendants().iterator().asScala
      .find(p => p.info().commandLine()
        .map[Boolean](_.contains("CoarseGrainedExecutorBackend"))
        .orElse(false) && p.isAlive)
      .filter(_.destroyForcibly())
      .map(_.pid())
  }

  /** Poll `q.status` until a trigger is actively processing data, then
    * (after a short grace so tasks are actually running on executors)
    * kill one executor. Returns the killed pid, or None if no active
    * trigger was observed within `timeoutMs` — the caller decides whether
    * a missed window fails the gate. */
  def killDuringBatch(q: StreamingQuery, timeoutMs: Long): Option[Long] = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      if (q.status.isTriggerActive && q.status.isDataAvailable) {
        Thread.sleep(500)
        if (q.status.isTriggerActive) {
          val pid = killOneExecutor()
          if (pid.isDefined) return pid
        }
      }
      Thread.sleep(50)
    }
    None
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_CHAOS_DOCS", "40000").toInt
    val builder = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER",
        "local-cluster[2,4,2048]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.ClusterProfile.configure(builder)
    val spark = builder.getOrCreate()
    graft.ClusterProfile.installCheckpoints(spark)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft-chaos")
      .toString
    val in = s"$root/in"; val hop = s"$root/accepts"; val rej = s"$root/rej"
    val docs = mkDocs(nDocs)
    val cfg = graft.operators.CurationPipeline.Config()

    // ---- batch ground truth (same engine-side LSH params as the twin)
    // sorted MULTISET of survivor digests, not a set: the exact-dup twins
    // share one md5 by construction, so a double-emit / dedup-state-loss
    // failure that lets BOTH twins survive a post-kill replay changes the
    // multiset but not the set — the exact exactly-once defect this gate
    // exists to catch (round-12 review)
    val want = graft.operators.CurationPipeline
      .run(docs.toDF(), cfg, collectStats = false)
      .curated.select(md5(col("text")).as("d"))
      .collect().map(_.getString(0)).sorted.toSeq
    println(s"[chaos] corpus=$nDocs batch survivors=${want.size}")

    // ---- stage 1: quality gate + watermarked exact dedup over a file
    // source, exactly-once parquet hop
    val schema = Encoders.product[ChaosDoc].schema
    val q1 = StreamTwins.funnelAccepts(
        spark.readStream.schema(schema).parquet(s"$in/chunk=*"))
      .writeStream.option("checkpointLocation", s"$root/cp1")
      .foreachBatch(IdempotentSink.parquetExactlyOnce(hop) _)
      .outputMode(OutputMode.Append()).start()
    // ---- stage 2: file source over the hop, stateful per-bucket LSH
    // rejection (fMGWS), exactly-once sink
    val q2 = StreamTwins.funnelNearDupRejects(
        spark.readStream.schema(schema).parquet(s"$hop/batch=*"),
        maxBucket = cfg.maxBucket, minJaccard = cfg.nearDupJaccard,
        k = cfg.minhashK, bands = cfg.minhashBands)
      .writeStream.option("checkpointLocation", s"$root/cp2")
      .foreachBatch(IdempotentSink.parquetExactlyOnce(rej) _)
      .outputMode(OutputMode.Append()).start()

    val kills = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]
    val half = nDocs / 2
    Seq(docs.take(half), docs.drop(half)).zipWithIndex.foreach {
      case (chunk, ci) =>
        // ONE file per chunk: the raw input dir has no commit protocol, so
        // a multi-file chunk could be discovered across two stage-1
        // triggers mid-write, splitting a near-dup pair across hop batches
        // with the later-id doc first — the id-ascending arrival contract
        // the funnel documents would be violated by the GATE, not the
        // engine (the hop itself is race-free since IdempotentSink's
        // atomic publish)
        chunk.toDF().coalesce(1).write.mode("overwrite")
          .parquet(s"$in/chunk=$ci")
        // arm the killer BEFORE the batch can start: it fires only while
        // a stage-2 trigger is actively processing — mid-batch, inside
        // the stateful stage
        val killer = new Thread(() => {
          killDuringBatch(q2, 120000L).foreach { pid =>
            kills.add(pid)
            System.err.println(s"[chaos] SIGKILLed executor pid=$pid " +
              s"mid-batch (chunk $ci)")
          }
        })
        killer.setDaemon(true); killer.start()
        q1.processAllAvailable()
        q2.processAllAvailable()
        killer.join(2000)
    }
    q1.stop(); q2.stop()

    import scala.jdk.CollectionConverters._
    val killed = kills.asScala.toList
    val accepts = IdempotentSink.committedRead(spark, hop)
    // committedRead throws on a path with no committed batches — probe
    // first so a never-triggered rejection stream reaches the guided
    // "[chaos] FAIL: ... emitted NOTHING" diagnostic below instead of
    // dying on the require (round-12 review)
    val rejects =
      if (IdempotentSink.committedBatches(spark, rej).isEmpty) Set.empty[Long]
      else IdempotentSink.committedRead(spark, rej)
        .collect().map(_.getLong(0)).toSet
    val got = accepts
      .join(rejects.toSeq.toDF("rid"),
        col("doc_id") === col("rid"), "left_anti")
      .select(md5(col("text")).as("d"))
      .collect().map(_.getString(0)).sorted.toSeq
    println(s"[chaos] kills=${killed.size} (pids ${killed.mkString(",")}) " +
      s"streaming survivors=${got.size} rejects=${rejects.size}")
    val ok = got == want && killed.nonEmpty && rejects.nonEmpty
    if (got != want) {
      // Seq.diff is multiset difference — a duplicated survivor shows up
      // as extra=1 even though its digest is also in `want`
      val miss = want.diff(got).size; val extra = got.diff(want).size
      System.err.println(
        s"[chaos] FAIL: survivors != batch (missing=$miss extra=$extra)")
    }
    if (killed.isEmpty) System.err.println(
      "[chaos] FAIL: zero executor kills landed mid-batch — the run " +
        "proves nothing about recovery; resize SPARK_GRAFT_CHAOS_DOCS up")
    if (rejects.isEmpty) System.err.println(
      "[chaos] FAIL: the stateful rejection stage emitted NOTHING — the " +
        "fMGWS path under test never produced output (corpus drift?); " +
        "survivor equality alone would be vacuous")
    if (ok) println(s"[chaos] PASS: ${killed.size} mid-batch executor " +
      s"kill(s); streaming survivors == batch (${want.size} docs)")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}

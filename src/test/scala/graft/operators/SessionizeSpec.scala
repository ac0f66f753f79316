package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Sessionize.assign must reproduce session_window's merge rule exactly —
  * events EXACTLY gap apart merge, strictly-greater gaps split — and its
  * per-key session count must agree with q62's aggregate form on the real
  * fixture.
  */
class SessionizeSpec extends SparkSpec {

  import spark.implicits._

  test("exact-gap events merge; strictly-greater gaps split; ties ordered") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000)
    val ev = Seq(
      (1L, 1L, at(0)),     // session 1
      (1L, 2L, at(600)),   // exactly 10 min later -> merges
      (1L, 3L, at(1201)),  // 10 min + 1s after #2 -> splits
      (1L, 4L, at(1201)),  // same ts as #3, tie-broken by id -> same session
      (2L, 5L, at(0)))     // separate key
      .toDF("user_id", "event_id", "ts")
    val got = Sessionize.assign(ev, Seq("user_id"), "ts",
        gap = "10 MINUTE", tieBreak = Seq("event_id"))
      .select(col("event_id"), col("session_seq")).as[(Long, Long)]
      .collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("session count per user agrees with session_window on the fixture") {
    val ev = Tables.events(spark, sfDir)
    val assigned = Sessionize.assign(ev, Seq("user_id"), "ts",
        gap = "30 MINUTE", tieBreak = Seq("event_id"))
      .groupBy(col("user_id"))
      .agg(max(col("session_seq")).as("n"))
    val windowed = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .count().groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    assert(assigned.join(windowed, Seq("user_id"))
      .filter(assigned("n") =!= windowed("n")).isEmpty)
  }
}

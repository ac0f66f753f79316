package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("id", "name", "amt")

  test("upsert: updates win on collision, new keys append, others untouched") {
    val updates = Seq((2L, "B2", 21.0), (4L, "d", 40.0)).toDF("id", "name", "amt")
    val out = Upsert(base, updates, Seq("id")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out == Map(
      1L -> ("a", 10.0), 2L -> ("B2", 21.0),
      3L -> ("c", 30.0), 4L -> ("d", 40.0)))
  }

  test("applyCdc: deletes drop the key; op column is not emitted") {
    val changes = Seq(
      (2L, "B2", 21.0, "u"), (3L, "c", 30.0, "d"), (5L, "e", 50.0, "U"))
      .toDF("id", "name", "amt", "op")
    val out = Upsert.applyCdc(base, changes, Seq("id"), "op")
    assert(out.columns.toSeq == Seq("id", "name", "amt"))
    val m = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "a", 2L -> "B2", 5L -> "e"))   // 3 deleted
  }

  test("versionCol resolves duplicate update keys: highest version wins") {
    val vbase = Seq((1L, "a", 1L)).toDF("id", "name", "ver")
    val dupUpdates = Seq((1L, "v2", 2L), (1L, "v9", 9L), (1L, "v5", 5L))
      .toDF("id", "name", "ver")
    val out = Upsert(vbase, dupUpdates, Seq("id"), versionCol = Some("ver"))
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "v9")))
    // and a stale update (version below base) still wins over base — the
    // operator orders update-beats-base first, version only among updates
    val stale = Upsert(Seq((1L, "base", 7L)).toDF("id", "name", "ver"),
      Seq((1L, "upd", 3L)).toDF("id", "name", "ver"),
      Seq("id"), versionCol = Some("ver"))
    assert(stale.select("name").first().getString(0) == "upd")
  }

  test("plan is union + window: no join node") {
    val updates = Seq((2L, "B2", 21.0)).toDF("id", "name", "amt")
    val p = Upsert(base, updates, Seq("id"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(800))
    assert(p.contains("Window"))
  }

  test("idempotent: applying the same change set twice is a no-op") {
    val changes = Seq((2L, "B2", 21.0, "u"), (3L, "c", 30.0, "d"))
      .toDF("id", "name", "amt", "op")
    val once = Upsert.applyCdc(base, changes, Seq("id"), "op")
    val twice = Upsert.applyCdc(once, changes, Seq("id"), "op")
    assert(twice.collect().toSet == once.collect().toSet)
  }
}

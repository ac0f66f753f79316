package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** q16's as-of semantics at equal timestamps — fixtures have µs-random
  * times so ties never occur there; this pins the tie-break on handcrafted
  * rows: a signup at the SAME ts as a purchase attaches iff its event_id
  * is smaller (the (ts, event_id) lexicographic as-of rule both the Spark
  * window and the DuckDB oracle implement).
  */
class AsofTieSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("same-timestamp signup attaches only when its event_id precedes the purchase") {
    val events = Seq(
      // user 1: signup id=1 at same ts as purchase id=2 → attaches (1 < 2)
      (1L, t("2024-01-01 10:00:00"), 1L, "signup"),
      (2L, t("2024-01-01 10:00:00"), 1L, "purchase"),
      // user 2: signup id=12 at same ts as purchase id=11 → does NOT attach
      (11L, t("2024-01-01 10:00:00"), 2L, "purchase"),
      (12L, t("2024-01-01 10:00:00"), 2L, "signup"),
      // user 2: later purchase sees the signup normally
      (13L, t("2024-01-01 11:00:00"), 2L, "purchase"),
      // user 3: purchase with no signup at all → null
      (21L, t("2024-01-01 09:00:00"), 3L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")

    // the exact q16 formulation (JoinQueries.q16_join_asof body)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = events
      .withColumn("signup_id",
        when(col("event_type") === "signup", col("event_id")))
      .withColumn("signup_event_id",
        last(col("signup_id"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("signup_event_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    assert(out(2L) == Some(1L))
    assert(out(11L) == None)
    assert(out(13L) == Some(12L))
    assert(out(21L) == None)
  }
}

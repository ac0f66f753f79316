package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the per-EVENT twin of `session_window`.
  *
  * `groupBy(session_window(...))` emits one row per session, which is the
  * right shape for session aggregates (q62) but loses the event→session
  * assignment every downstream per-event computation needs (funnel steps
  * inside a session, attribution, sequence models over session-scoped
  * event runs). This operator keeps every input row and appends the
  * session identity it belongs to, with `session_window`'s exact merge
  * rule: a new session starts when the gap since the PREVIOUS event is
  * strictly greater than `gap` (events exactly `gap` apart merge).
  *
  * Shape: one `lag` + one running `sum` over the same (keys, ts) window —
  * a single shuffle on the session keys, the partitioning an event log
  * already has on a pre-bucketed layout (exchange-free there). The
  * session ordinal is a count of session STARTS up to the current row, so
  * it needs no second pass and no join back; `(keys, session_seq)` is the
  * stable session identity (first session = 1 per key).
  *
  * Determinism: ties on `ts` are broken by `tieBreak` (pass a unique id);
  * the boundary flag uses the previous row in that total order, so equal
  * timestamps never race.
  */
object Sessionize {

  def assign(events: DataFrame, keys: Seq[String], ts: String,
             gap: String, tieBreak: Seq[String]): DataFrame = {
    val order: Seq[Column] = col(ts) +: tieBreak.map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev_ts", lag(col(ts), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          col(ts) > col("__prev_ts") + expr(s"INTERVAL $gap"), 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("__new_session")).over(wRun))
      .drop("__prev_ts", "__new_session")
  }
}

package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.2.G — streaming-shaped queries, declared as their deterministic batch
  * twins (the driver's oracle is batch DuckDB). The true streaming twins —
  * same transforms behind `readStream` with watermarks — live in
  * `graft.streaming.StreamTwins` and are proven equivalent in unit tests
  * (SURVEY §5.2.3); streaming output is never declared for t2.
  *
  * All four shapes shuffle once on their grouping key. `window()` /
  * `session_window()` are Catalyst expressions evaluated map-side before the
  * aggregate — at 100 TB the pre-shuffle partial aggregation collapses each
  * (window × key) group to one row per input partition before the exchange.
  */
object StreamShapeQueries {

  def q60_window_tumbling(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        Det.r2(Det.sumMoney(col("value"))).as("sum_v"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_v"))
      .orderBy(col("window_start"), col("event_type"))

  def q61_window_sliding(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 day", "6 hours"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))
      .orderBy(col("window_start"))

  def q62_session_window(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        Det.r2(Det.sumMoney(col("value"))).as("sum_v"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("sum_v"))
      .orderBy(col("user_id"), col("session_start"))

  def q63_dedup_keyed(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val oracle: Map[String, String] = Map(
    "q60_window_tumbling" ->
      """SELECT date_trunc('day', ts) AS window_start, event_type,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    // Spark's sliding windows start at epoch + k*slide; with a 6h slide the
    // candidate starts are every 6h mark. Grid = all 6h marks from one day
    // before min(ts) to max(ts); windows with zero events absent (inner join).
    "q61_window_sliding" ->
      """SELECT g.ws AS window_start, count(*) AS n
        |FROM (SELECT unnest(generate_series(
        |        date_trunc('day', (SELECT min(ts) FROM events)) - INTERVAL 1 DAY,
        |        (SELECT max(ts) FROM events),
        |        INTERVAL 6 HOUR)) AS ws) g
        |JOIN events e ON e.ts >= g.ws AND e.ts < g.ws + INTERVAL 1 DAY
        |GROUP BY g.ws ORDER BY window_start""".stripMargin,
    // gaps-and-islands matching Spark session_window's observed merge rule:
    // an event exactly gap-length after the previous one still JOINS the
    // session (verified empirically in StreamingSpec's boundary test), so
    // only a STRICTLY greater gap starts a new session.
    "q62_session_window" ->
      """SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_v
        |FROM (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM (
        |    SELECT user_id, ts, value, event_id,
        |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |             OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                > INTERVAL 30 MINUTE
        |           THEN 1 ELSE 0 END AS new_s
        |    FROM events))
        |GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "q63_dedup_keyed" ->
      """SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
  )
}

package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.2.L addendum — declarative data-quality screening (q125): the
  * dbt-test / Deequ-style constraint suite a pipeline runs before
  * publishing a table. One row per rule: range, primary-key uniqueness,
  * referential integrity, null screen, empty-document screen — violation
  * counts plus the rate in basis points. The expected production output
  * is n_bad = 0 on most rules; the fixtures genuinely violate the
  * empty-text rule, so the query is not a constant.
  *
  * Scale shape: every same-table rule fuses into ONE scan of that table
  * (conditional aggregates); the FK rule is a key-only left join — at
  * 100 TB the dimension key set broadcasts or co-partitions, never a
  * second fact scan per rule.
  */
object DqQueries {

  def q125_dq_checks(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).agg(
      count(lit(1)).as("n_checked"),
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
        .otherwise(0L)).as("n_bad"))
      .withColumn("rule", lit("lineitem_qty_range"))
    val opk = Tables.orders(spark, sfDir).agg(
      count(lit(1)).as("n_checked"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("n_bad"))
      .withColumn("rule", lit("orders_pk_unique"))
    val ofk = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir).select(col("c_custkey")).distinct()
        .withColumn("__m", lit(1)),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("__m").isNull, 1L).otherwise(0L)).as("n_bad"))
      .withColumn("rule", lit("orders_customer_fk"))
    val ev = Tables.events(spark, sfDir).agg(
      count(lit(1)).as("n_checked"),
      sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("n_bad"))
      .withColumn("rule", lit("events_null_user"))
    val doc = Tables.documents(spark, sfDir).agg(
      count(lit(1)).as("n_checked"),
      sum(when(length(col("text")) === 0, 1L).otherwise(0L)).as("n_bad"))
      .withColumn("rule", lit("documents_empty_text"))
    li.unionByName(opk).unionByName(ofk).unionByName(ev).unionByName(doc)
      .select(col("rule"), col("n_checked"), col("n_bad"),
        expr("n_bad * 10000 div n_checked").as("bad_bp"))
      .orderBy(col("rule"))
  }

  /** Benford first-digit screen (q184): the classic forensic-accounting /
    * data-quality test — leading significant digits of naturally-grown
    * monetary amounts follow log10(1 + 1/d), and fabricated or truncated
    * feeds drift from it. Run over order totals: per digit 1..9 the
    * observed count, observed share, Benford's expected share, and the
    * deviation — the per-digit drift a DQ monitor alerts on.
    *
    * Exactness: the digit is the first character of the integer CENTS
    * string (cents ≥ 1013·100 here, always positive — no sign/zero arm),
    * so extraction is pure string/integer work; expected shares are the
    * nine round(log10(1+1/d)·10⁴) constants INLINED as integer literals
    * (3010, 1761, ... 458 bp) — no runtime float leaves the engines.
    *
    * Scale shape: one scan → 9-group two-phase agg → 1-row total
    * broadcast. Nothing here grows with the table beyond the scan.
    */
  def q184_benford(spark: SparkSession, sfDir: String): DataFrame = {
    val bp = Seq(3010L, 1761L, 1249L, 969L, 792L, 669L, 580L, 512L, 458L)
    val expect = when(col("digit") === 1, bp(0))
      .when(col("digit") === 2, bp(1)).when(col("digit") === 3, bp(2))
      .when(col("digit") === 4, bp(3)).when(col("digit") === 5, bp(4))
      .when(col("digit") === 6, bp(5)).when(col("digit") === 7, bp(6))
      .when(col("digit") === 8, bp(7)).otherwise(bp(8))
    Tables.orders(spark, sfDir)
      .select(substring(round(col("o_totalprice") * 100).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .withColumn("total",
        sum(col("n")).over(org.apache.spark.sql.expressions.Window
          .partitionBy()))
      .withColumn("share_bp", expr("n * 10000 div total"))
      .withColumn("benford_bp", expect)
      .select(col("digit"), col("n"), col("share_bp"), col("benford_bp"),
        (col("share_bp") - col("benford_bp")).as("dev_bp"))
      .orderBy(col("digit"))
  }

  /** Cross-table reconciliation (q187): does each order's header total
    * equal the sum of its line charges `extprice·(1−disc)·(1+tax)` within
    * a 1.00 tolerance? The classic warehouse closing-the-books check —
    * header-vs-detail drift is the first thing a finance DQ suite
    * reconciles, and it is CROSS-table where q125's rules are all
    * single-table (+ one FK probe). The fixture genuinely violates the
    * identity (synthetic totals are drawn independently) and 257 orders
    * have no lines at sf0.01, so every output column is a live signal.
    *
    * Exactness: each LINE's charge is quantized to integer cents ONCE
    * (one rounded double product per row, the q58/q149 float-boundary
    * rule), so the per-order sum is an integer sum — partition-order-free
    * — and the delta/verdict arithmetic is pure BIGINT.
    *
    * Scale shape: one two-phase lineitem agg keyed o_orderkey (the
    * natural join key — bucketed layouts make it exchange-free), one
    * left join to orders, one |statuses|-row rollup.
    */
  def q187_order_reconcile(spark: SparkSession, sfDir: String): DataFrame = {
    val lines = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")) * 100).cast("long").as("line_cents"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("line_cents")).as("line_total"))
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("hdr_cents"))
      .join(lines, col("o_orderkey") === col("l_orderkey"), "left")
      .withColumn("delta",
        when(col("line_total").isNotNull,
          abs(col("hdr_cents") - col("line_total"))))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("line_total").isNull, 1L).otherwise(0L))
          .as("n_no_lines"),
        sum(when(col("delta") > 100L, 1L).otherwise(0L)).as("n_mismatch"),
        sum(coalesce(col("delta"), lit(0L))).as("sum_abs_delta"))
      .select(col("o_orderstatus"), col("n_orders"), col("n_no_lines"),
        col("n_mismatch"),
        expr("n_mismatch * 10000 div n_orders").as("mismatch_bp"),
        // nullif guards an all-headers-no-lines status group (NULL avg,
        // same as the oracle's // nullif) instead of a divide-by-zero
        expr("sum_abs_delta div nullif(n_orders - n_no_lines, 0)")
          .as("avg_abs_delta_cents"))
      .orderBy(col("o_orderstatus"))
  }

  /** SLO error-budget burn (q206): per day, the error-event share
    * against a 20% (2000 bp) error budget — daily burn rate in milli
    * (1000 = burning exactly at budget) and the cumulative error share
    * since the window opened. The SRE readout (multiwindow burn-rate
    * alerting reads exactly these numbers) applied to the product event
    * log; complements q125's static rules (which validate rows, not
    * reliability over time) and q169's change-point (which finds WHEN,
    * this tracks HOW MUCH budget is left).
    *
    * Exactness: pure integer counts; every ratio floors once with
    * non-negative operands. The budget constant is a declared knob.
    *
    * Scale shape: one two-phase (day) agg collapses the log; the
    * cumulative window runs over the calendar-bounded daily frame.
    */
  def q206_slo_burn(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.events(spark, sfDir)
      .select(expr(Det.epochDaySql("ts")).as("day"),
        when(col("event_type") === "error", 1L).otherwise(0L).as("e"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"), sum(col("e")).as("n_err"))
    val wCum = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    d.withColumn("err_bp", expr("n_err * 10000 div n"))
      .withColumn("cum_n", sum(col("n")).over(wCum))
      .withColumn("cum_err", sum(col("n_err")).over(wCum))
      .select(col("day"), col("n"), col("n_err"), col("err_bp"),
        expr("err_bp * 1000 div 2000").as("burn_milli"),
        expr("cum_err * 10000 div cum_n").as("cum_err_bp"))
      .orderBy(col("day"))
  }

  /** Order-aging report (q208): per order status × 30-day age bucket
    * (ages measured back from the corpus horizon — q192's 1-row
    * broadcast pattern), order counts, cent totals, and each bucket's
    * share of its status — the receivables/backlog aging schedule every
    * finance-ops close runs (open orders piling into the 90+ bucket is
    * the collections alarm; finished orders SHOULD skew old). The
    * bucketed-age dimension complements q187 (which reconciles amounts,
    * not time) and q199 (calendar trend, not outstanding age).
    *
    * Exactness: ages are exact integer epoch-day differences (both
    * operands µs BIGINTs, one floor); the bucket is
    * `least(age div 30, 3)` rendered as a sortable zero-padded label via
    * CASE — identical literals both engines; shares floor once in bp.
    *
    * Scale shape: one scan → two-phase (status, bucket) agg (≤ 12
    * groups); the share window runs over that bounded frame; the horizon
    * is a 1-row broadcast. Nothing after the scan is corpus-sized.
    */
  def q208_order_aging(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderstatus"), unix_micros(col("o_orderdate")).as("us"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val h = o.agg(max(col("us")).as("hus"))
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus"))
    o.crossJoin(broadcast(h))
      .withColumn("age_days", expr(Det.floorDivSql("hus - us", "86400000000")))
      .withColumn("bucket",
        expr("CASE least(age_days div 30, 3L) WHEN 0 THEN '000-029' " +
          "WHEN 1 THEN '030-059' WHEN 2 THEN '060-089' ELSE '090+' END"))
      .groupBy(col("o_orderstatus"), col("bucket"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
      .withColumn("share_bp",
        expr("n_orders * 10000 div sum(n_orders) over " +
          "(partition by o_orderstatus)"))
      .select(col("o_orderstatus"), col("bucket"), col("n_orders"),
        col("cents"), col("share_bp"))
      .orderBy(col("o_orderstatus"), col("bucket"))
  }

  /** Sample-ratio-mismatch screen (q223): per day, the χ² of the A/B
    * daily-active split against the designed 50/50 (q134's md5
    * assignment rule verbatim) — the experiment-health check that runs
    * BEFORE anyone reads q134's effect: a significant SRM means the
    * assignment or logging pipeline is biased and the readout is
    * garbage (the single most common silent A/B failure). 2-cell χ² =
    * (nA−nB)²/n, flagged at the 3.84 critical value (α = 0.05, df 1).
    *
    * Exactness: users counted once per (day, arm) via distinct; the
    * statistic is reported in centi units as (nA−nB)²·100 div n — one
    * floor on non-negative operands; the flag compares pre-floor
    * integers ((nA−nB)²·100 > 384·n), so it is exact, not a rounded
    * readback.
    *
    * Scale shape: distinct (day, user) → (day) conditional two-phase
    * agg; the day frame is calendar-bounded. The md5 arm is a pure
    * projection — no assignment table, no join.
    */
  def q223_srm_screen(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .select(expr(Det.epochDaySql("ts")).as("day"),
        col("user_id")).distinct()
      .withColumn("arm",
        when(substring(md5(col("user_id").cast("string")), 1, 4) < "8000",
          "A").otherwise("B"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"))
      .select(col("day"), col("n_users"), col("n_a"), col("n_b"),
        expr("(n_a - n_b) * (n_a - n_b) * 100 div n_users")
          .as("chi2_centi"),
        ((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")) * 100 >
          col("n_users") * 384).as("srm"))
      .orderBy(col("day"))
  }

  val oracle: Map[String, String] = Map(
    "q223_srm_screen" ->
      """WITH u AS (SELECT DISTINCT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    user_id FROM events),
        |a AS (SELECT day,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 4) < '8000'
        |      THEN 'A' ELSE 'B' END AS arm FROM u),
        |g AS (SELECT day, count(*) AS n_users,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b
        |  FROM a GROUP BY day)
        |SELECT day, n_users, n_a, n_b,
        |  CAST((n_a - n_b) * (n_a - n_b) * 100 // n_users AS BIGINT)
        |    AS chi2_centi,
        |  ((n_a - n_b) * (n_a - n_b) * 100 > n_users * 384) AS srm
        |FROM g ORDER BY day""".stripMargin,
    "q208_order_aging" ->
      """WITH o AS (SELECT o_orderstatus, epoch_us(o_orderdate) AS us,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |h AS (SELECT max(us) AS hus FROM o),
        |b AS (SELECT o_orderstatus, cents,
        |    CASE LEAST((hus - us) // 86400000000 // 30, 3)
        |      WHEN 0 THEN '000-029' WHEN 1 THEN '030-059'
        |      WHEN 2 THEN '060-089' ELSE '090+' END AS bucket
        |  FROM o, h),
        |g AS (SELECT o_orderstatus, bucket, count(*) AS n_orders,
        |    CAST(sum(cents) AS BIGINT) AS cents
        |  FROM b GROUP BY 1, 2)
        |SELECT o_orderstatus, bucket, n_orders, cents,
        |  CAST(n_orders * 10000 // sum(n_orders)
        |    OVER (PARTITION BY o_orderstatus) AS BIGINT) AS share_bp
        |FROM g ORDER BY o_orderstatus, bucket""".stripMargin,
    "q206_slo_burn" ->
      """WITH d AS (SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    count(*) AS n,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_err
        |  FROM events GROUP BY 1),
        |c AS (SELECT day, n, n_err,
        |    CAST(n_err * 10000 // n AS BIGINT) AS err_bp,
        |    sum(n) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
        |    sum(n_err) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_err
        |  FROM d)
        |SELECT day, n, n_err, err_bp,
        |  CAST(err_bp * 1000 // 2000 AS BIGINT) AS burn_milli,
        |  CAST(cum_err * 10000 // cum_n AS BIGINT) AS cum_err_bp
        |FROM c ORDER BY day""".stripMargin,
    "q187_order_reconcile" ->
      """WITH l AS (SELECT l_orderkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
        |      * (1.0 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS line_total
        |  FROM lineitem GROUP BY l_orderkey),
        |j AS (SELECT o.o_orderstatus,
        |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS hdr_cents,
        |    l.line_total,
        |    CASE WHEN l.line_total IS NOT NULL
        |      THEN abs(CAST(round(o.o_totalprice * 100) AS BIGINT) - l.line_total)
        |    END AS delta
        |  FROM orders o LEFT JOIN l ON o.o_orderkey = l.l_orderkey)
        |SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CASE WHEN line_total IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_no_lines,
        |  CAST(sum(CASE WHEN delta > 100 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_mismatch,
        |  CAST(sum(CASE WHEN delta > 100 THEN 1 ELSE 0 END) * 10000
        |    // count(*) AS BIGINT) AS mismatch_bp,
        |  CAST(sum(coalesce(delta, 0)) // nullif(count(*) -
        |    sum(CASE WHEN line_total IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
        |    AS avg_abs_delta_cents
        |FROM j GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q184_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
        |    AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM orders),
        |c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        |SELECT digit, n, CAST(n * 10000 // total AS BIGINT) AS share_bp,
        |  CAST(CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761 WHEN 3 THEN 1249
        |    WHEN 4 THEN 969 WHEN 5 THEN 792 WHEN 6 THEN 669 WHEN 7 THEN 580
        |    WHEN 8 THEN 512 ELSE 458 END AS BIGINT) AS benford_bp,
        |  CAST(n * 10000 // total AS BIGINT) - CAST(CASE digit WHEN 1 THEN 3010
        |    WHEN 2 THEN 1761 WHEN 3 THEN 1249 WHEN 4 THEN 969 WHEN 5 THEN 792
        |    WHEN 6 THEN 669 WHEN 7 THEN 580 WHEN 8 THEN 512 ELSE 458 END
        |    AS BIGINT) AS dev_bp
        |FROM c, t ORDER BY digit""".stripMargin,
    "q125_dq_checks" ->
      """WITH li AS (SELECT 'lineitem_qty_range' AS rule, count(*) AS n_checked,
        |    CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_bad FROM lineitem),
        |opk AS (SELECT 'orders_pk_unique', count(*),
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders),
        |ofk AS (SELECT 'orders_customer_fk', count(*),
        |    CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o.o_custkey = c.c_custkey),
        |ev AS (SELECT 'events_null_user', count(*),
        |    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM events),
        |doc AS (SELECT 'documents_empty_text', count(*),
        |    CAST(sum(CASE WHEN length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM documents)
        |SELECT rule, n_checked, n_bad,
        |  CAST(n_bad * 10000 // n_checked AS BIGINT) AS bad_bp
        |FROM (SELECT * FROM li UNION ALL SELECT * FROM opk
        |      UNION ALL SELECT * FROM ofk UNION ALL SELECT * FROM ev
        |      UNION ALL SELECT * FROM doc)
        |ORDER BY rule""".stripMargin,
  )
}

package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.2.D window functions + §2.2.E set operations.
  *
  * Windows partition by a key (customer / user) — one shuffle on the
  * partition key, then a per-partition sort; no self-joins. At 100 TB the
  * partition count follows the key cardinality, and AQE coalesces small
  * post-shuffle partitions.
  */
object WindowSetQueries {

  def q30_window_rank(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        Det.r2(col("o_totalprice")).as("o_totalprice"),
        col("rn"), col("rnk"), col("drnk"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  def q31_window_frame(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val running = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val moving = base.rowsBetween(-2, 0)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("run_sum", Det.r2(Det.sumMoneyOver(col("value"), running)))
      .withColumn("mov_avg", Det.r4(avg(col("value")).over(moving)))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("run_sum"), col("mov_avg"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  def q32_window_lag(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("us_since_prev",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("prev_type"), col("us_since_prev"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Distribution window functions: ntile quartiles, percent_rank and
    * cume_dist — all rank-derived rationals, deterministic under the
    * unique (price, orderkey) sort.
    *
    * NOT `ntile(4).over(partitionBy(priority))`: o_orderpriority has 5
    * values, so the naive window sorts 20% of ALL orders in one task at
    * any scale. Two-phase rewrite instead: (1) range-bucket the rounded
    * price (fixed $25k-wide buckets — boundaries only steer parallelism,
    * never values), count rows per (priority, bucket) and turn the
    * bounded count table into broadcast cumulative offsets; (2) the only
    * corpus-sized window partitions by (priority, bucket) — parallelism
    * |priorities|×|buckets| — and the exact per-priority row number is
    * offset + within-bucket row_number. ntile/percent_rank/cume_dist are
    * then pure arithmetic in (rn, n), replicating Spark's own
    * definitions bit-for-bit: larger-buckets-first ntile; (rn−1)/(n−1)
    * and rn/n as double divisions (rank = rn under the unique sort).
    */
  def q33_window_ntile(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        Det.r2(col("o_totalprice")).as("o_totalprice"))
      .withColumn("bkt",
        floor(col("o_totalprice") / lit(25000.0)).cast("long"))
    // bounded count table: ≤ |priorities| × |price range / 25k| rows
    val counts = o.groupBy(col("o_orderpriority"), col("bkt"))
      .agg(count(lit(1)).as("c"))
    val wOff = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("bkt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col("o_orderpriority"))
    val offs = counts
      .withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
      .withColumn("n", sum(col("c")).over(wTot))
      .select(col("o_orderpriority"), col("bkt"), col("off"), col("n"))
    val wIn = Window.partitionBy(col("o_orderpriority"), col("bkt"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.join(broadcast(offs), Seq("o_orderpriority", "bkt"))
      .withColumn("rn", col("off") + row_number().over(wIn))
      // Spark's NTile with k=4: n div 4 rows per bucket, the first
      // n mod 4 buckets take one extra (larger-buckets-first); the ELSE
      // branch is unreachable when n div 4 = 0, so its DIV never sees 0
      .withColumn("quartile", expr(
        """CASE WHEN rn <= (n DIV 4 + 1) * (n % 4)
          |  THEN (rn + n DIV 4) DIV (n DIV 4 + 1)
          |  ELSE n % 4 + (rn - (n DIV 4 + 1) * (n % 4) + n DIV 4 - 1)
          |       DIV (n DIV 4)
          |END""".stripMargin).cast("long"))
      .withColumn("pr", Det.r6(when(col("n") > 1,
        (col("rn") - 1).cast("double") / (col("n") - 1).cast("double"))
        .otherwise(lit(0.0))))
      .withColumn("cd",
        Det.r6(col("rn").cast("double") / col("n").cast("double")))
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice"), col("quartile"), col("pr"), col("cd"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  /** Time-range window frame: clicks by the same user in the hour strictly
    * before each purchase. The frame is a RANGE over epoch-µs — one shuffle
    * on user_id, no self-join, linear state per user (the shape a
    * range-join would otherwise explode).
    */
  def q34_window_range(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, -1L)  // [ts−1h, ts−1µs]
    Tables.events(spark, sfDir)
      .withColumn("n_prior_clicks",
        coalesce(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .over(w), lit(0L)))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("n_prior_clicks"))
      .orderBy(col("event_id"))
  }

  /** first_value / last_value / nth_value over the full per-user frame,
    * collapsed to one row per user.
    */
  def q35_window_firstlast(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, sfDir)
      .withColumn("first_event", first_value(col("event_id")).over(full))
      .withColumn("last_event", last_value(col("event_id")).over(full))
      .withColumn("second_event", nth_value(col("event_id"), 2).over(full))
      .withColumn("rn", row_number().over(ord))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("first_event"), col("last_event"),
        col("second_event"))
      .orderBy(col("user_id"))
  }

  private def buildingCustkeys(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))

  private def bigOrderCustkeys(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 490000)
      .select(col("o_custkey").as("c_custkey"))

  def q40_union(spark: SparkSession, sfDir: String): DataFrame =
    buildingCustkeys(spark, sfDir)
      .union(bigOrderCustkeys(spark, sfDir))
      .distinct()
      .orderBy(col("c_custkey"))

  /** multiset union — duplicates preserved (Spark union == SQL UNION ALL) */
  def q43_union_all(spark: SparkSession, sfDir: String): DataFrame =
    buildingCustkeys(spark, sfDir)
      .union(bigOrderCustkeys(spark, sfDir))
      .orderBy(col("c_custkey"))

  /** multiset difference with real duplicate counts: orderkeys of 'A'
    * lineitems minus orderkeys of 'R' lineitems, per-occurrence.
    */
  def q44_except_all(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.filter(col("l_returnflag") === "A").select(col("l_orderkey"))
      .exceptAll(
        li.filter(col("l_returnflag") === "R").select(col("l_orderkey")))
      .orderBy(col("l_orderkey"))
  }

  def q41_intersect(spark: SparkSession, sfDir: String): DataFrame =
    buildingCustkeys(spark, sfDir)
      .intersect(bigOrderCustkeys(spark, sfDir))
      .orderBy(col("c_custkey"))

  def q42_except(spark: SparkSession, sfDir: String): DataFrame =
    buildingCustkeys(spark, sfDir)
      .except(bigOrderCustkeys(spark, sfDir))
      .orderBy(col("c_custkey"))

  private val setA = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
  private val setB = "SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 490000"

  /** Distribution window functions (round 3): percent_rank / cume_dist /
    * nth_value. The ORDER BY key (c_acctbal, c_custkey) is unique, so rank
    * fractions are identical across engines (k/n binary divisions — exact);
    * nth_value uses the default running frame in both.
    */
  def q36_window_distribution(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(spark, sfDir)
      .select(
        col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        nth_value(col("c_custkey"), 2).over(w).as("second_key"))
      .orderBy(col("c_mktsegment"), col("c_custkey"))
  }

  /** 2-D skyline / Pareto frontier (q150): orders no other order
    * dominates on (earlier-or-equal date, higher-or-equal price, one
    * strict) — the multi-objective "best trade-offs" operator (price vs
    * recency, quality vs length, cost vs latency). The 2-D case reduces
    * to a running max over the date order: keep a row iff its price
    * strictly beats every strictly-earlier day's max AND it is its own
    * day's max (same-day same-price duplicates are mutually
    * non-dominating and all kept).
    *
    * Scale shape — the naive form is a GLOBAL window over all orders
    * (one task holds the corpus: wrong). Here the running max runs over
    * the per-day AGGREGATE (|days| rows, bounded by the calendar, not
    * the order count), and a broadcast join on (day, cents) recovers
    * the winning order rows — the standard local-skyline-then-merge
    * decomposition with the day aggregate as the local phase. Emit
    * (o_orderkey, day, cents); order by o_orderkey.
    */
  def q150_skyline(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir).select(col("o_orderkey"),
      expr(Det.epochDaySql("o_orderdate")).as("day"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val daily = o.groupBy(col("day")).agg(max(col("cents")).as("m_day"))
    val wPrev = Window.orderBy(col("day"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val skyDays = daily
      .withColumn("m_prev", max(col("m_day")).over(wPrev))
      .filter(col("m_prev").isNull || col("m_day") > col("m_prev"))
      .select(col("day"), col("m_day").as("cents"))
    o.join(broadcast(skyDays), Seq("day", "cents"))
      .select(col("o_orderkey"), col("day"), col("cents"))
      .orderBy(col("o_orderkey"))
  }

  val oracle: Map[String, String] = Map(
    "q150_skyline" ->
      """WITH o AS (
        |  SELECT o_orderkey, date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |w AS (SELECT o_orderkey, day, cents,
        |    max(cents) OVER (ORDER BY day
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_prev,
        |    max(cents) OVER (PARTITION BY day) AS m_day
        |  FROM o)
        |SELECT o_orderkey, day, cents FROM w
        |WHERE (m_prev IS NULL OR cents > m_prev) AND cents = m_day
        |ORDER BY o_orderkey""".stripMargin,
    "q36_window_distribution" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  nth_value(c_custkey, 2) OVER w AS second_key
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |  ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q30_window_rank" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
        |  rn, rnk, drnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER w AS rn, rank() OVER w AS rnk,
        |    dense_rank() OVER w AS drnk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q31_window_frame" ->
      """SELECT user_id, ts, event_id,
        |  round(CAST(sum(CAST(value AS DECIMAL(12,2)))
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS run_sum,
        |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg
        |FROM events ORDER BY user_id, ts, event_id""".stripMargin,
    "q32_window_lag" ->
      """SELECT user_id, ts, event_id,
        |  lag(event_type) OVER w AS prev_type,
        |  epoch_us(ts) - epoch_us(lag(ts) OVER w) AS us_since_prev
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "q33_window_ntile" ->
      """SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS o_totalprice,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q34_window_range" ->
      """SELECT event_id, n_prior_clicks FROM (
        |  SELECT event_id, event_type,
        |    CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts
        |        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
        |          AND INTERVAL 1 MICROSECOND PRECEDING), 0) AS BIGINT) AS n_prior_clicks
        |  FROM events)
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q35_window_firstlast" ->
      """SELECT user_id, first_event, last_event, second_event FROM (
        |  SELECT user_id,
        |    first_value(event_id) OVER wf AS first_event,
        |    last_value(event_id) OVER wf AS last_event,
        |    nth_value(event_id, 2) OVER wf AS second_event,
        |    row_number() OVER wo AS rn
        |  FROM events
        |  WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id),
        |    wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q40_union" ->
      s"""SELECT c_custkey FROM ($setA UNION $setB) ORDER BY c_custkey""",
    "q43_union_all" ->
      s"""SELECT c_custkey FROM ($setA UNION ALL $setB) ORDER BY c_custkey""",
    "q44_except_all" ->
      """SELECT l_orderkey FROM (
        |  SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
        |  EXCEPT ALL
        |  SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
        |ORDER BY l_orderkey""".stripMargin,
    "q41_intersect" ->
      s"""SELECT c_custkey FROM ($setA INTERSECT $setB) ORDER BY c_custkey""",
    "q42_except" ->
      s"""SELECT c_custkey FROM ($setA EXCEPT $setB) ORDER BY c_custkey""",
  )
}

package graft.operators

import graft.{Det, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.2.L — event/product analytics + PII scrubbing over the `events`
  * table: funnel conversion, cohort retention, event-sequence transition
  * counts, and the C4/Dolma-style PII redaction stage. Hash-checked
  * against DuckDB oracles like the rest of the declared surface.
  *
  * Scale notes (100 TB): every query here shuffles at most on `user_id`
  * (funnel, retention, transitions — the natural partitioning of an event
  * log, so a pre-bucketed layout makes them exchange-free) or not at all
  * (PII redaction is a scan-speed regex projection). No collects, no
  * cross joins, no unbounded broadcasts.
  */
object EventQueries {

  /** PII redaction (q118): the PRODUCTION scrubber
    * ([[graft.functions.TextFunctions.scrubPii]] — the same chain
    * CurationPipeline applies and `scrub_pii` exposes in SQL), declared
    * and hash-checked. The fixture corpus is synthetic word-salad with no
    * natural PII, so the query first derives a contact-card string from
    * event columns — the SAME deterministic construction in both engines,
    * the q101 eval-set stand-in pattern — exercising all five classes
    * (email/IP/SSN/card/phone) with row-varying presence (1-6 tags/row),
    * so the hash pins global replacement, word boundaries, and the
    * precedence order (SSN before the phone heuristic, card before both),
    * not a constant.
    */
  def q118_pii_redact(spark: SparkSession, sfDir: String): DataFrame = {
    val synth = concat(
      lit("evt "), col("event_type"),
      lit(" u"), col("user_id").cast("string"), lit("@Mail.Example.com"),
      when(col("event_id") % 3 =!= 0,
        concat(lit(" call +1 (555) 123-"),
          lpad((col("event_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit(" no phone")),
      when(col("user_id") % 3 === 0,
        concat(lit(" ssn 123-45-"),
          lpad((col("user_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(col("event_id") % 7 < 2,
        concat(lit(" card 4111 1111 1111 "),
          lpad((col("event_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(col("user_id") % 2 === 0,
        concat(lit(" cc Admin"), (col("user_id") % 7).cast("string"),
          lit("@corp.example.org")))
        .otherwise(lit("")),
      when(col("event_id") % 5 < 3,
        concat(lit(" from 10."), (col("user_id") % 256).cast("string"),
          lit("."), (col("event_id") % 256).cast("string"), lit(".9")))
        .otherwise(lit(" offline")))
    Tables.events(spark, sfDir)
      .select(col("event_id"), synth.as("synth"))
      .select(col("event_id"),
        TextFunctions.piiCount(col("synth")).as("n_pii"),
        TextFunctions.scrubPii(col("synth")).as("redacted"))
      .orderBy(col("event_id"))
  }

  /** Funnel conversion (q119): of users whose first `signup` event exists,
    * how many made a `purchase` within 3 days of it — reported per
    * user_id%8 cohort with the conversion rate in integer basis points
    * (the house no-float-boundary rule).
    *
    * One shuffle keyed on user_id for the signup min(); the purchase probe
    * joins on the same key (AQE broadcasts the 150-row signup side at
    * fixture scale; at 100 TB both sides hash-partition on user_id — the
    * event log's natural key, skew-guarded by AQE).
    */
  def q119_event_funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("first_signup"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    val converted = signups.join(purchases, Seq("user_id"))
      .filter(col("p_ts") >= col("first_signup") &&
        col("p_ts") <= col("first_signup") + expr("INTERVAL 3 DAY"))
      .select(col("user_id")).distinct()
      .withColumn("__c", lit(1))
    signups.join(converted, Seq("user_id"), "left")
      .groupBy((col("user_id") % 8).as("cohort"))
      .agg(count(lit(1)).as("n_signed"), count(col("__c")).as("n_converted"))
      .select(col("cohort"), col("n_signed"), col("n_converted"),
        expr("n_converted * 10000 div n_signed").as("conv_bp"))
      .orderBy(col("cohort"))
  }

  /** Cohort retention (q120): users cohorted by the day of their first
    * qualifying event (a `purchase` above 150.00 — compared in integer
    * cents, no float boundary), counted on each later active day k.
    * Calendar math stays in epoch-day integers (`datediff` vs 1970-01-01)
    * — engine-stable, no timezone/week-start divergence.
    *
    * Two user_id-keyed shuffles (first-day agg + join back) and one on
    * (cohort_day, k); the distinct-user count partial-aggregates map-side.
    */
  def q120_cohort_retention(spark: SparkSession, sfDir: String): DataFrame = {
    val active = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase" &&
        round(col("value") * 100).cast("long") > 15000L)
      .select(col("user_id"),
        expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')")
          .cast("long").as("d"))
    val firsts = active.groupBy(col("user_id"))
      .agg(min(col("d")).as("cohort_day"))
    active.join(firsts, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("d") - col("cohort_day")).as("k"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("k"))
  }

  /** Event-sequence transition matrix (q121): per user, each event's
    * successor type under (ts, event_id) order — event_id breaks timestamp
    * ties deterministically — aggregated to (type, next_type) pair counts.
    * The Markov-chain view of product analytics ("what follows a click").
    *
    * One window shuffle on user_id, then a pre-aggregated 25-row result;
    * at 100 TB the window partition is the per-user event list, which is
    * exactly how an event store is already laid out.
    */
  def q121_event_transitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("event_type"), col("next_type"))
  }

  /** RFM segmentation (q122): per user, Recency (days since last event,
    * relative to the corpus max day — a 1-row broadcast aggregate, q105
    * pattern), Frequency (event count), Monetary (value summed in integer
    * cents — rounded per row BEFORE the sum, order-independent), and the
    * classic quadrant label. Thresholds sit inside the fixture variance so
    * all four segments materialize.
    *
    * One user_id-keyed aggregation + a broadcast 1-row reference date; at
    * 100 TB this is a scan + one shuffle on the log's natural key.
    */
  def q122_user_rfm(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val ref = ev.agg(max(col("ts").cast("date")).as("ref_day"))
    ev.groupBy(col("user_id"))
      .agg(max(col("ts").cast("date")).as("last_day"),
        count(lit(1)).as("f"),
        sum(round(col("value") * 100).cast("long")).as("m_cents"))
      .crossJoin(broadcast(ref))
      .select(col("user_id"),
        datediff(col("ref_day"), col("last_day")).cast("long").as("r_days"),
        col("f"), col("m_cents"))
      .withColumn("segment",
        when(col("r_days") <= 0 && col("f") >= 67, "core")
          .when(col("r_days") <= 0, "active")
          .when(col("f") >= 67, "whale")
          .otherwise("casual"))
      .orderBy(col("user_id"))
  }

  /** SCD2 interval reconstruction (q123): the event log's `event_type`
    * stream per user, collapsed to CHANGE rows (consecutive equal states
    * merge — the lag filter), then versioned validity intervals
    * [valid_from, valid_to) with an open current row — the
    * slowly-changing-dimension type-2 table a warehouse materializes from
    * CDC. (ts, event_id) ordering makes ties deterministic.
    *
    * Two window passes over the SAME (user_id) partitioning — one
    * shuffle; the change filter shrinks the second pass's input.
    */
  def q123_scd2_intervals(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type").as("status"), col("ts"),
        col("event_id"))
      .withColumn("prev_status", lag(col("status"), 1).over(w))
      .filter(col("prev_status").isNull || col("prev_status") =!= col("status"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(col("user_id"), col("status"), col("ts").as("valid_from"),
        col("valid_to"), col("version"))
      .orderBy(col("user_id"), col("version"))
  }

  /** Time-weighted average (q124): per user, the value held over each
    * inter-event interval weighted by its duration — the irregular-series
    * mean (sensor/position/price feeds), where a plain avg() overweights
    * bursts. All math in integers: cents × microseconds summed as BIGINT
    * (bounded by max_cents × corpus span ≪ 2⁶³), one integer division at
    * the end. The last event per user carries no interval (lead is null)
    * and drops out, mirroring the oracle.
    *
    * One window + one agg on the same user_id partitioning — single
    * shuffle at any scale.
    */
  def q124_time_weighted_avg(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("dt_us",
        unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
      .filter(col("dt_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dt_us")).as("span_us"),
        sum(col("cents") * col("dt_us")).as("num"))
      .filter(col("span_us") > 0)  // degenerate all-simultaneous guard
      .select(col("user_id"), col("n_intervals"), col("span_us"),
        expr("num div span_us").as("twa_cents"))
      .orderBy(col("user_id"))
  }

  /** Last-touch attribution (q126): each purchase credits the most recent
    * NON-purchase event by the same user within a 1-day lookback, else
    * 'none' — the marketing-attribution shape. The carry-forward is a
    * running `last(..., ignoreNulls)` over rows [start, current-1], the
    * same union+window trick as the as-of joins (q16/q19): no self-join,
    * no range explosion. Revenue in per-row-rounded integer cents.
    */
  def q126_attribution(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val nonPurchase = col("event_type") =!= "purchase"
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      // both carry-forwards in ONE select so they land in one Window
      // operator (separate withColumns leave a Project between them and
      // defeat CollapseWindow — plan-pinned)
      .select(col("*"),
        last(when(nonPurchase, col("event_type")), ignoreNulls = true)
          .over(w).as("prev_type"),
        last(when(nonPurchase, col("ts")), ignoreNulls = true)
          .over(w).as("prev_ts"))
      .filter(col("event_type") === "purchase")
      .withColumn("touch",
        when(col("prev_ts").isNotNull &&
          col("prev_ts") >= col("ts") - expr("INTERVAL 1 DAY"),
          col("prev_type")).otherwise(lit("none")))
      .groupBy(col("touch"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents")).as("revenue_cents"))
      .orderBy(col("touch"))
  }

  /** Ordered multi-step window funnel (q127, the ClickHouse
    * `windowFunnel` shape): users completing signup → click → purchase in
    * STRICT order, every step inside 7 days of the first signup, each
    * step's timestamp the EARLIEST one after its predecessor (min-chain —
    * deterministic, and the optimal greedy choice: an earliest-possible
    * step never forecloses a later one). Emits per-cohort step counts.
    *
    * Three min-aggregations chained by same-key joins — every shuffle on
    * user_id, so the whole funnel is one partitioning; step k's input
    * shrinks monotonically. The 2-step special case collapses to q119.
    */
  def q127_window_funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_type"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("ts") > col("t1") &&
        col("ts") <= col("t1") + expr("INTERVAL 7 DAY"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t2"), min(col("t1")).as("t1"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("ts") > col("t2") &&
        col("ts") <= col("t1") + expr("INTERVAL 7 DAY"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    s1.join(s2.select(col("user_id"), col("t2")), Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .groupBy((col("user_id") % 4).as("cohort"))
      .agg(count(lit(1)).as("n_step1"), count(col("t2")).as("n_step2"),
        count(col("t3")).as("n_step3"))
      .orderBy(col("cohort"))
  }

  /** Point-in-interval range join (q129): every activity event joined to
    * the per-user PURCHASE REGIME active at its timestamp — regimes run
    * half-open from each purchase to the user's next one (the last,
    * open-ended regime is excluded, so both engines see identical finite
    * intervals). The "which version/owning record was live at event time"
    * shape — fact-to-SCD2 point-in-time lookups, price-at-trade-time,
    * config-at-request-time — declared through the generic
    * [[RangeJoin.pointInInterval]] operator with a 1-day bin.
    *
    * Scale: see [[RangeJoin]] — the binned rewrite plans a plain shuffled
    * equi-join on (user_id, bin) with the range check as a residual
    * (plan-pinned: no nested-loop, no cartesian), instead of the
    * per-key-quadratic sort-merge a raw BETWEEN predicate gets.
    */
  def q129_interval_join(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val wIv = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from"), col("purchase_id"))
    val intervals = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wIv))
      .filter(col("valid_to").isNotNull)
    val points = ev.filter(col("event_type").isin("click", "view", "error"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("at_us"))
    RangeJoin.pointInInterval(points, intervals, Seq("user_id"),
        at = "at_us", from = "valid_from", to = "valid_to",
        binWidth = 86400L * 1000000L)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("purchase_id"), (col("at_us") - col("valid_from")).as("since_us"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Per-event sessionization (q131): [[Sessionize.assign]] declared over
    * the event log, rolled up to per-session stats so the output is
    * hash-compact. Same 30-minute strictly-greater gap rule as q62's
    * `session_window` — but the assignment form keeps the event→session
    * mapping (q62's aggregate form cannot), which is what funnels,
    * attribution, and session-scoped sequence features consume.
    *
    * One window + one agg on the same user_id partitioning — single
    * shuffle, exchange-free on a user-bucketed layout.
    */
  def q131_sessionize(spark: SparkSession, sfDir: String): DataFrame =
    Sessionize.assign(Tables.events(spark, sfDir), Seq("user_id"), "ts",
        gap = "30 MINUTE", tieBreak = Seq("event_id"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        unix_micros(min(col("ts"))).as("start_us"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .as("dur_us"))
      .orderBy(col("user_id"), col("session_seq"))

  /** Fixed-bucket value histogram per event type (q132): the distribution
    * report every metrics pipeline emits. Bucket ids are exact double
    * arithmetic (`floor(value/50)` clamped to [0,9] — same literal ops in
    * both engines), shares in integer basis points off window-summed
    * counts. One agg + one window on the agg's tiny output; a scan-speed
    * single shuffle at any scale.
    */
  def q132_value_histogram(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = least(greatest(floor(col("value") / 50.0), lit(0.0)),
      lit(9.0)).cast("long")
    val wT = Window.partitionBy(col("event_type"))
    Tables.events(spark, sfDir)
      .select(col("event_type"), bucket.as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share_bp",
        expr("(n * 10000) div sum(n) over (partition by event_type)"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** Rolling z-score anomalies (q133): each event scored against its
    * user's trailing 20-event window — the streaming-friendly outlier
    * screen (fraud, sensor glitches, bot bursts). All moments in exact
    * integers (cents, cents², window sums ≤ 1e12 ≪ 2⁶³);
    * `z = (20·x − Σx) / √(20·Σx² − (Σx)²)` does ONE double sqrt+divide on
    * those exact integers, so both engines compute bit-identical doubles
    * — the q111/q112 integer-quantization discipline applied to variance.
    * Partial windows (first 19 events) and zero-variance windows are
    * excluded on both sides.
    *
    * One window + one filter on the user_id partitioning — single shuffle.
    */
  def q133_rolling_zscore(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-19, 0)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1", sum(col("cents")).over(w))
      .withColumn("s2", sum(col("cents") * col("cents")).over(w))
      .filter(col("n") === 20 &&
        col("n") * col("s2") - col("s1") * col("s1") > 0)
      .withColumn("z", Det.r4((col("cents") * col("n") - col("s1")) /
        sqrt(col("n") * col("s2") - col("s1") * col("s1"))))
      .filter(abs(col("z")) > lit(2.5))
      .select(col("user_id"), col("event_id"), col("cents"), col("z"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** A/B experiment readout (q134): users assigned to arms by the
    * engine's own deterministic [[graft.functions.Sampling.hashSample]]
    * (md5 bucketing — the q73 split machinery, so assignment is
    * reproducible across runs, engines, and layouts), compared with the
    * two-proportion z-test. The fixture metric is "first event is a
    * purchase" (~20% — every-user metrics like "any purchase" saturate at
    * p=1 on this corpus and make the pooled variance a 0/0). Counts are
    * exact integers from one agg pass; the z formula does its double
    * divisions/sqrt on those exact integers in the same literal order in
    * both engines (q133 discipline), rounded r4.
    *
    * One window + two aggs (per-user, then 1-row conditional rollup) —
    * everything after the first agg is |users| rows; no joins.
    */
  def q134_ab_test(spark: SparkSession, sfDir: String): DataFrame = {
    val wFirst = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val perUser = Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(wFirst))
      .groupBy(col("user_id"))
      .agg(max(when(col("rn") === 1 && col("event_type") === "purchase", 1L)
        .otherwise(0L)).as("converted"))
      .withColumn("arm",
        when(graft.functions.Sampling.hashSample(col("user_id"), 0.5), "A")
          .otherwise("B"))
    val s = perUser.agg(
      sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === "A", col("converted")).otherwise(0L)).as("x_a"),
      sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === "B", col("converted")).otherwise(0L)).as("x_b"))
    val p = (col("x_a") + col("x_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val z = (col("x_a").cast("double") / col("n_a") -
      col("x_b").cast("double") / col("n_b")) /
      sqrt((p * (lit(1.0) - p)) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    // degenerate readouts (an empty arm, or 0%/100% pooled conversion)
    // have no defined z — and under ANSI semantics the division would
    // THROW, not NaN, so the guard precedes the formula on both engines
    s.filter(col("n_a") > 0 && col("n_b") > 0 &&
        col("x_a") + col("x_b") > 0 &&
        col("x_a") + col("x_b") < col("n_a") + col("n_b"))
      .select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        Det.r4(z).as("z"))
  }

  /** Per-user value trend (q135): OLS slope of spend over time — the
    * grouped-regression operator (user trajectories, sensor drift,
    * per-entity forecasting features). x = whole seconds since the user's
    * first event, y = integer cents; all five moments (n, Σx, Σy, Σxy,
    * Σx²) are EXACT integer sums (bounds: x ≤ 2.6e6 s, Σxy ≤ 1e13,
    * n·Σx² ≤ 3e16 ≪ 2⁶³), so the slope's one double divide+scale is
    * bit-identical across engines (q133 discipline). Degenerate users
    * (all events in one second) drop out via the zero-variance guard.
    *
    * One min-window + one agg on the same user_id partitioning — single
    * shuffle; moments combine associatively, so partials collapse
    * map-side at any scale.
    */
  def q135_trend_slope(spark: SparkSession, sfDir: String): DataFrame = {
    val wU = Window.partitionBy(col("user_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("at_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("min_us", min(col("at_us")).over(wU))
      .withColumn("x", expr("(at_us - min_us) div 1000000"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("cents")).as("sy"),
        sum(col("x") * col("cents")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .filter(col("n") * col("sxx") - col("sx") * col("sx") > 0)
      .select(col("user_id"), col("n"),
        Det.r4(((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx"))) * lit(86400.0))
          .as("slope_cents_day"))
      .orderBy(col("user_id"))
  }

  /** Robust statistics per event type (q136): median, MAD (median absolute
    * deviation), and the 5/95-winsorized mean — the outlier-resistant
    * summary trio (q26's moment stats break under heavy tails; q133 flags
    * outliers, this one summarizes robustly despite them). Percentile
    * parity with the oracle is the q27 precedent (identical interpolated
    * doubles, r4); the winsorized mean stays deterministic by quantizing
    * each clamped value to integer milli-cent units BEFORE summing (one
    * double clamp+round per distinct cents value — engine-identical; a
    * raw double sum would be partition-order-dependent).
    *
    * Scale shape: one spillable two-phase histogram agg over the corpus;
    * percentiles, winsorization, and MAD all run over the bounded cents
    * alphabet ([[graft.functions.ExactPercentile]]) — the per-group
    * `percentile()` object buffer this replaced held every value of a
    * group on one executor. |types|-row quantile frames broadcast (the
    * q101 rule, not the q92 one).
    */
  def q136_robust_stats(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.ExactPercentile
    // ONE corpus scan → (event_type, cents) count histogram. Winsorized
    // units and absolute deviations are pure functions of (type, cents),
    // so every stage below runs over the bounded cents alphabet — no
    // percentile() object buffer, no second pass over raw events.
    val hist = Tables.events(spark, sfDir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
    val qs = ExactPercentile.fromHistogram(hist, Seq("event_type"),
      "cents", "cnt", Seq(0.05 -> "p05", 0.5 -> "p50", 0.95 -> "p95"))
    val enriched = hist.join(broadcast(qs), "event_type")
      .withColumn("w_units",
        round(least(greatest(col("cents").cast("double"), col("p05")),
          col("p95")) * 1000).cast("long"))
      .withColumn("absdev", abs(col("cents").cast("double") - col("p50")))
    val base = enriched.groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("n"),
        Det.r4(min(col("p50"))).as("median_cents"),
        sum(col("w_units") * col("cnt")).as("w_units_sum"))
    // distinct cents equidistant from p50 collide on absdev → re-aggregate
    // the deviation histogram before the crossing rule
    val madHist = enriched.groupBy(col("event_type"), col("absdev"))
      .agg(sum(col("cnt")).as("cnt"))
    val mad = ExactPercentile.fromHistogram(madHist, Seq("event_type"),
      "absdev", "cnt", Seq(0.5 -> "mad_raw"))
    base.join(broadcast(mad), "event_type")
      .select(col("event_type"), col("n"), col("median_cents"),
        Det.r4(col("mad_raw")).as("mad_cents"),
        Det.r4(col("w_units_sum").cast("double") /
          (col("n") * lit(1000))).as("wins_mean_cents"))
      .orderBy(col("event_type"))
  }

  /** Running DISTINCT count over a window (q137): how many distinct event
    * types each user has produced so far — the engagement-breadth signal.
    * Spark has no `count(DISTINCT)` over windows; the standard rewrite is
    * `size(collect_set(...))`, whose set state is bounded by the type
    * alphabet (NOT by history length), making it safe at any scale. The
    * oracle runs DuckDB's native distinct window aggregate — the rewrite
    * is hash-checked against the real semantics, not against itself.
    */
  def q137_window_distinct(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("n_types_seen",
        size(collect_set(col("event_type")).over(w)).cast("long"))
      .select(col("user_id"), col("event_id"), col("n_types_seen"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** DAU/WAU stickiness (q138): per day, distinct active users that day
    * over distinct users in the trailing 7 days — the engagement ratio
    * every product dashboard carries. Trailing-window DISTINCT counts
    * don't compose from daily partials, so the standard rewrite scatters
    * each (day, user) pair onto the 7 future days it supports (the q129
    * binning idea applied to a sliding frame: |pairs|×7 rows, linear),
    * then counts distinct per day. Epoch-day integer math (q120 rule);
    * ratio in integer basis points; report days are those with activity.
    */
  def q138_dau_wau(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = Tables.events(spark, sfDir)
      .select(datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
        .cast("long").as("day"), col("user_id"))
      .distinct()
    val dau = pairs.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("dau"))
    val wau = pairs
      .withColumn("rday", explode(sequence(col("day"), col("day") + 6)))
      .groupBy(col("rday"))
      .agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, dau("day") === wau("rday"))
      .select(col("day"), col("dau"), col("wau"),
        expr("(dau * 10000) div wau").as("stickiness_bp"))
      .orderBy(col("day"))
  }

  /** Top-2 purchases per user (q140): the custom TopKPerKey operator
    * (q128) exercised on the EVENT log with a filter below it — the
    * strategy plans over a filtered child, the heap orders by a double
    * with an id tie-break, and the shuffle stays bounded at users×2 rows
    * however long the log grows (the Window form ships every purchase).
    */
  def q140_topk_events(spark: SparkSession, sfDir: String): DataFrame =
    graft.plans.TopK.perKey(
        Tables.events(spark, sfDir).filter(col("event_type") === "purchase"),
        Seq("user_id"), Seq(col("value").desc, col("event_id").asc), 2)
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .orderBy(col("user_id"), col("event_id"))

  /** Grouped Pearson correlation (q142): r between time-of-day and spend
    * per event type — the bivariate analog of q135, on the same exact-
    * integer-moment discipline. The BUILT-IN `corr` is Welford-based and
    * partition-order-dependent in its last bits (never hash-stable);
    * here all six moments are exact integer sums (each ≪ 2⁶³), cast to
    * double once, and combined in the same literal order in both engines
    * — products like n·Σx² exceed 2⁶³ but are IEEE-identical doubles of
    * identical exact operands. Zero-variance groups drop; r4.
    */
  def q142_correlation(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.events(spark, sfDir)
      .select(col("event_type"),
        // pmod: seconds-of-day must land in [0, 86400) for pre-epoch
        // timestamps too (% is sign-of-dividend on both engines)
        expr("pmod(unix_micros(ts), 86400000000) div 1000000").as("x"),
        round(col("value") * 100).cast("long").as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val nd = col("n").cast("double")
    val vx = nd * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = nd * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    val num = nd * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    s.filter(col("n") > 1)
      .withColumn("vx", vx).withColumn("vy", vy)
      .filter(col("vx") > 0 && col("vy") > 0)
      .select(col("event_type"), col("n"),
        Det.r4(num / (sqrt(col("vx")) * sqrt(col("vy")))).as("r"))
      .orderBy(col("event_type"))
  }

  /** Daily resample + LOCF gap-fill (q144): the time-series
    * regularization step every forecasting / feature pipeline runs —
    * per-user purchase value carried forward over a dense daily grid
    * from that user's first to last purchase day. Three stages, ALL
    * keyed on user_id (one partitioning reused end to end; exchange-free
    * on a user-bucketed layout): (1) daily last-value pick via
    * row_number over (day, ts desc, event_id desc) — deterministic under
    * ts ties; (2) grid = explode(sequence(min_day, max_day)) — linear in
    * output rows, no cross join; (3) LOCF = last(cents, ignoreNulls)
    * over a running row frame. Values in integer cents (house rule);
    * days as epoch-day integers. The leading row is never null by
    * construction (min_day is a purchase day). The `% 3` user subset is
    * a fixture-size bound, not semantics. Emit (user_id, day, cents);
    * order by (user_id, day).
    */
  def q144_resample_locf(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase" && col("user_id") % 3 === 0)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("day", expr(Det.floorDivSql("us", "86400000000")))
    val wPick = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("us").desc, col("event_id").desc)
    val daily = p.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1).select("user_id", "day", "cents")
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val wFill = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        last(col("cents"), ignoreNulls = true).over(wFill).as("cents"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Interval-overlap join (q146): user sessions (the q131 gap-merge,
    * closed intervals [first,last] in µs) against 40 deterministic
    * campaign windows anchored at the global min event time (md5-jittered
    * starts/lengths — the q101 stand-in pattern, as the fixtures carry no
    * campaign table), reporting per-campaign session counts and total
    * overlap. Overlap predicate `s0 ≤ c1 AND c0 ≤ s1`, overlap length
    * `least(s1,c1) − greatest(s0,c0)` — exact integer µs, summed as
    * BIGINT. Plan shape: the campaign side is 40 rows ⇒ BROADCAST nested
    * loop is the right physical join (each session row tests 40
    * intervals in codegen — no shuffle of the session side at all);
    * when BOTH interval sets are large this degenerates to a cartesian
    * and the binned equi-join rewrite takes over
    * ([[RangeJoin.pointInInterval]], q129 — same algebra, bins on both
    * sides). Emit (campaign_id, n_sessions, overlap_us); order by
    * campaign_id.
    */
  def q146_interval_overlap(spark: SparkSession, sfDir: String): DataFrame = {
    val sess = Sessionize.assign(Tables.events(spark, sfDir),
        Seq("user_id"), "ts", gap = "30 MINUTE", tieBreak = Seq("event_id"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(unix_micros(min(col("ts"))).as("s0"),
        unix_micros(max(col("ts"))).as("s1"))
    // every event belongs to a session and a session starts at its min
    // event ts, so min(s0) IS the global min event time — derived from
    // the session frame instead of a second full scan of the event log
    val base = sess.agg(min(col("s0")).as("b"))
    val hc = md5(col("id").cast("string"))
    val camp = spark.range(40).crossJoin(broadcast(base))
      .withColumn("c0", col("b") + col("id") * 21600000000L +
        conv(substring(hc, 1, 12), 16, 10).cast("long") % 10800000000L)
      .withColumn("c1", col("c0") + 7200000000L +
        conv(substring(hc, 13, 12), 16, 10).cast("long") % 14400000000L)
      .select(col("id").as("campaign_id"), col("c0"), col("c1"))
    sess.join(broadcast(camp),
        col("s0") <= col("c1") && col("c0") <= col("s1"))
      .groupBy(col("campaign_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(least(col("s1"), col("c1")) - greatest(col("s0"), col("c0")))
          .as("overlap_us"))
      .orderBy(col("campaign_id"))
  }

  /** q173: event-log pivot report — cent totals per event type × ISO
    * weekday, weekdays to columns: the warehouse-report pivot shape (q45)
    * applied to the product-analytics log, closing the reporting surface
    * over events. Spark lowers `pivot` to ONE conditional-aggregation
    * pass (the same CASE-WHEN plan the oracle spells out) — no join, no
    * repeated scans (plan-pinned like q45). Per-row integer cents before
    * the sum (§7.2); empty (type, weekday) cells are NULL on both
    * engines. Emit (event_type, d1..d7); order by event_type.
    */
  def q173_event_pivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("weekday(ts) + 1").cast("long").as("wday"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"))
      .pivot("wday", Seq(1, 2, 3, 4, 5, 6, 7))
      .agg(sum(col("cents")))
      .select(col("event_type") +:
        (1 to 7).map(d => col(d.toString).as(s"d$d")): _*)
      .orderBy(col("event_type"))

  /** q176: event-log grouping-sets rollup — the subtotal companion of
    * q173's pivot: cent totals and counts per event_type, per ISO
    * weekday, and the grand total in ONE pass (Spark lowers GROUPING
    * SETS to a single Expand + HashAggregate — the q24 warehouse shape
    * on the product-analytics log). grouping() flags disambiguate the
    * NULL-as-total rows; NULLS FIRST pinned (Spark and DuckDB default
    * differently).
    */
  def q176_event_rollup(spark: SparkSession, sfDir: String): DataFrame =
    // Dataset.groupingSets (not a temp view + spark.sql): the former
    // SQL form registered a FIXED global view name, so two concurrent
    // q176 calls with different sfDir on one session raced on it —
    // the only session-global mutable state in the surface
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("weekday(ts) + 1").cast("long").as("wday"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupingSets(
        Seq(Seq(col("event_type")), Seq(col("wday")), Seq()),
        col("event_type"), col("wday"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
        grouping(col("event_type")).cast("long").as("g_type"),
        grouping(col("wday")).cast("long").as("g_wday"))
      .orderBy(col("g_type"), col("g_wday"),
        col("event_type").asc_nulls_first, col("wday").asc_nulls_first)

  /** q174: per-type ECDF / rank normalization — each event's value
    * percentile within its event type, in integer basis points
    * (rn·10000 div n under the unique (cents, event_id) sort): the
    * rank/quantile feature transform (quantile normalization, outlier
    * trimming thresholds, score calibration) feature pipelines apply
    * before training.
    *
    * Scale shape: [[graft.functions.ScalableRank]] — a low-cardinality
    * partitionBy(event_type) window would sort ~20% of the log in one
    * task, and fixed-width VALUE buckets (the first cut) collapse back
    * to one task under a point-mass value distribution. ScalableRank
    * keys the corpus window by (type, cents, id-range sub-bucket), so
    * task size is capped at the bucket width however skewed the values
    * are (spec-proven under a 90% point mass). Pure integer output — no
    * float division to diverge.
    */
  def q174_value_ecdf(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    graft.functions.ScalableRank
      .rowNumbers(ev, Seq("event_type"), "cents", "event_id")
      .select(col("event_id"), col("event_type"), col("cents"),
        expr("rn * 10000 DIV n").as("pct_bp"))
      .orderBy(col("event_id"))
  }

  /** Chi-square independence test (q149): event_type × day-of-week —
    * the categorical-association screen (is traffic shape independent of
    * weekday?) behind seasonality checks and drift monitors. Counts are
    * exact integers; expected values rt·ct/N are exact-integer-operand
    * doubles (products ≤ n² ≪ 2⁵³); each cell's (o−e)²/e term is
    * computed in one literal order and quantized to INTEGER micro-units
    * BEFORE summing (the house float-boundary rule — a 7-addend double
    * sum would be partition-order-dependent), so the per-type χ²
    * contribution is bit-exact in both engines. Cells with zero count
    * simply don't exist (no 0/0 arm — ANSI-safe). The contingency table
    * is |types|×7 rows, so every window after the first agg is over a
    * bounded frame. Emit (event_type, n_type, chi2_micro); order by
    * event_type.
    */
  def q149_chi_square(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.events(spark, sfDir)
      .select(col("event_type"),
        // pmod, not %: both engines' % is sign-of-dividend, so a bare
        // (day + 4) % 7 splits each weekday into a negative and a
        // positive key on pre-epoch days (same split on both engines —
        // the hash gate alone can't see it; oracle mirrors the pmod)
        expr(s"pmod(${Det.epochDaySql("ts")} + 4, 7)").as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("o"))
    val cell = c
      .withColumn("rt", sum(col("o")).over(Window.partitionBy(col("event_type"))))
      .withColumn("ct", sum(col("o")).over(Window.partitionBy(col("dow"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
      .withColumn("e", col("rt").cast("double") * col("ct").cast("double")
        / col("n").cast("double"))
    cell
      .withColumn("term",
        round((col("o").cast("double") - col("e"))
          * (col("o").cast("double") - col("e")) / col("e") * 1000000)
          .cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("o")).as("n_type"), sum(col("term")).as("chi2_micro"))
      .orderBy(col("event_type"))
  }

  /** Longest active-day streak (q153): gaps-and-islands on the INTEGER
    * day axis — q131's sessionize handles time-gap islands; this is the
    * calendar variant (consecutive-day runs) behind habit/retention
    * streaks. The island key is `day − row_number()` over each user's
    * distinct days (consecutive days share it — the classic islands
    * identity), then two rollups. Pure integer arithmetic end to end;
    * every stage keyed on user_id (one partitioning, exchange-free on a
    * user-bucketed layout). Emit (user_id, n_days, max_streak); order by
    * user_id.
    */
  def q153_day_streaks(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr(Det.epochDaySql("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    d.withColumn("island", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("streak"))
      .groupBy(col("user_id"))
      .agg(sum(col("streak")).as("n_days"),
        max(col("streak")).as("max_streak"))
      .orderBy(col("user_id"))
  }

  /** Market-basket lift (q154): association strength between heavy
    * usage of event-type pairs — lift = P(a∧b)/(P(a)·P(b)) over users,
    * the co-occurrence × independence-baseline readout behind
    * recommendation and cross-sell analyses (q93's doc-term co-occurrence
    * re-expressed on behavioral baskets). "In basket" = the user fired
    * that type ≥ 12 times (the raw any-occurrence basket is vacuous on
    * the dense fixture — every user does everything). Lift reported in
    * integer micro-units via BIGINT floor division (no float anywhere).
    * Shape: one (user,type) agg, a per-user self-join bounded by
    * |types|² per user, then |types|²-row joins — the pair table never
    * exceeds the type-alphabet square regardless of log size. Emit
    * (type_a, type_b, n_ab, lift_micro); order by (type_a, type_b).
    */
  def q154_basket_lift(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val ut = ev.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= 12)
      .select(col("user_id"), col("event_type"))
    val nUsers = ev.agg(countDistinct(col("user_id")).as("n_users"))
    val t = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
    // explicit renames on the right side: self-join column references to
    // identical attribute ids otherwise lean on Spark's ambiguity
    // resolution (the trivially-true-predicate trap)
    val utB = ut.select(col("user_id").as("user_id_b"),
      col("event_type").as("type_b"))
    val p = ut
      .join(utB, col("user_id") === col("user_id_b")
        && col("event_type") < col("type_b"))
      .groupBy(col("event_type").as("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    p.crossJoin(broadcast(nUsers))
      .join(broadcast(t.select(col("event_type").as("type_a"),
        col("n_t").as("n_a"))), Seq("type_a"))
      .join(broadcast(t.select(col("event_type").as("type_b"),
        col("n_t").as("n_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_ab"),
        // staged floor divisions keep every intermediate ≤ max(n·10⁶,
        // 10⁶·n): the single-expression form n_ab·N·10⁶ overflows BIGINT
        // (ANSI throw) near 3M distinct users — inside the scale envelope
        expr("(n_ab * 1000000 div n_a) * n_users div n_b")
          .as("lift_micro"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Smoothed target (mean) encoding per user (q183): the m-estimate
    * feature transform — encode a high-cardinality category (user_id) as
    * its average event value shrunk toward the global mean,
    * `enc = (Σcents + m·prior) / (n + m)` with m = 20 — so thin users
    * sit near the prior and heavy users near their own mean. This is the
    * leakage-safe categorical encoder (Micci-Barreca 2001) feature
    * pipelines run before training, the categorical sibling of q174's
    * rank normalization.
    *
    * Exactness: cents are integers, the prior is one BIGINT floor
    * division of global totals, and the encoding is staged integer
    * arithmetic in MILLI-cents — no float ever exists, so no
    * partition-order or engine drift. Shape: ONE per-user two-phase agg
    * + a 1-row global total broadcast; nothing beyond the scan grows
    * with the log, and per-user state is two counters.
    */
  def q183_target_encode(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), round(col("value") * 100).cast("long").as("cents"))
    val per = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
    val tot = ev.agg(sum(col("cents")).as("g_cents"),
      count(lit(1)).as("g_n"))
    per.crossJoin(broadcast(tot))
      .withColumn("prior_cents", expr("g_cents div g_n"))
      .select(col("user_id"), col("n"), col("sum_cents"),
        col("prior_cents"),
        expr("(sum_cents + 20 * prior_cents) * 1000 div (n + 20)")
          .as("enc_milli"))
      .orderBy(col("user_id"))
  }

  /** Decile gains table (q188): rank users by lifetime spend (the model
    * score in this fixture), cut into 10 equal-depth deciles, and report
    * each decile's purchase-response rate, lift over the base rate, and
    * cumulative response capture — the gains/lift chart every targeting
    * or propensity model ships with, completing the ML-evaluation
    * surface next to the unit-tier calibration solver
    * ([[graft.functions.Isotonic]]).
    *
    * Exactness: pure integers end-to-end — score is summed cents, ranks
    * come from [[graft.functions.ScalableRank]] under the (−score, id)
    * sort, decile = (rn−1)·10 div n, and rate/lift/capture are staged
    * BIGINT basis-point divisions (the q154 overflow discipline;
    * nullif-guarded base rate).
    *
    * Scale shape: one per-user two-phase agg, then ScalableRank's
    * bucketed ranking (max task = idBucketWidth even when every user has
    * the same score) — never a global single-task sort; everything after
    * is a 10-row frame.
    */
  def q188_decile_gains(spark: SparkSession, sfDir: String): DataFrame = {
    val per = Tables.events(spark, sfDir)
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("isp"))
      .groupBy(col("user_id"))
      .agg(sum(col("cents")).as("score"), max(col("isp")).as("resp"))
    val ranked = graft.functions.ScalableRank.rowNumbers(
      per.withColumn("negs", -col("score")), Seq.empty, "negs", "user_id")
    val dec = ranked
      .withColumn("decile", expr("(rn - 1) * 10 div n + 1"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("resp")).as("n_resp"))
    val wAll = Window.partitionBy()
    val wCum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec
      .withColumn("tot_u", sum(col("n_users")).over(wAll))
      .withColumn("tot_r", sum(col("n_resp")).over(wAll))
      .withColumn("cum_r", sum(col("n_resp")).over(wCum))
      .select(col("decile"), col("n_users"), col("n_resp"),
        expr("n_resp * 10000 div n_users").as("resp_bp"),
        expr("(n_resp * 10000 div n_users) * 1000 div " +
          "nullif(tot_r * 10000 div tot_u, 0)").as("lift_milli"),
        expr("cum_r * 10000 div nullif(tot_r, 0)").as("cum_capture_bp"))
      .orderBy(col("decile"))
  }

  /** Two-sample Kolmogorov–Smirnov drift screen (q189): for each event
    * type, the max ECDF gap (basis-point resolution) between the A and B
    * user populations of q134's deterministic hash split — the
    * distribution-shift test that catches what q134's mean-based z-test
    * cannot (equal means, different shapes), next to q113's KL
    * divergence (binned, corpus-level) and q149's χ² (categorical).
    *
    * Exactness: the statistic is max |cumA·10⁴ div nA − cumB·10⁴ div nB|
    * over the per-(type, cents) cell frame — every term is a bounded
    * BIGINT (≤ 10⁴, no nA·nB cross-product overflow at any scale) and
    * both engines floor identically, so the declared statistic is exact
    * at 1 bp resolution (within 2 bp of the unrounded KS).
    *
    * Scale shape: one two-phase (type, cents) cell agg collapses the
    * log; every window after runs over the value-alphabet-bounded cell
    * frame (the q149/q168 argument).
    */
  def q189_ks_drift(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"),
        when(graft.functions.Sampling.hashSample(col("user_id"), 0.5), 1L)
          .otherwise(0L).as("ina"))
    val cell = ev.groupBy(col("event_type"), col("cents"))
      .agg(sum(col("ina")).as("ca"), sum(lit(1L) - col("ina")).as("cb"))
    val wt = Window.partitionBy(col("event_type"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cell
      .withColumn("na", sum(col("ca")).over(wt))
      .withColumn("nb", sum(col("cb")).over(wt))
      .withColumn("cuma", sum(col("ca")).over(wCum))
      .withColumn("cumb", sum(col("cb")).over(wCum))
      // nullif: a type whose users all hash into one arm has na or nb
      // = 0 — ANSI Spark would throw DIVIDE_BY_ZERO where the oracle's
      // `// 0` yields NULL; nullif makes both engines emit NULL (and a
      // NULL ks_bp for that type — the honest answer to an empty arm)
      .withColumn("dev", abs(
        expr("cuma * 10000 div nullif(na, 0)") -
          expr("cumb * 10000 div nullif(nb, 0)")))
      .groupBy(col("event_type"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(col("dev")).as("ks_bp"))
      .select(col("event_type"), col("n_a"), col("n_b"), col("ks_bp"))
      .orderBy(col("event_type"))
  }

  /** Exact ROC AUC via the tie-aware Mann–Whitney identity (q191): for
    * each event type, how well the user's activity COUNT of that type
    * ranks high-spenders above low-spenders — the threshold-free
    * companion of q188's decile gains (a gains table reads one ranking
    * at fixed depths; AUC integrates over all of them). Label = upper
    * half of users by lifetime spend cents under the deterministic
    * (cents, user_id) order ([[graft.functions.ScalableRank]] — the
    * median split adapts to any SF, never degenerate); score = the
    * user's event count of the type, with inactive users scored 0 (a
    * classifier IS evaluated on users who never triggered the feature).
    *
    * Exactness: with ties, AUC = [Σ_v p_v·(2·Q<v + q_v)] / (2·P·N)
    * where p_v/q_v are positives/negatives at score v and Q<v the
    * negatives strictly below — every term an exact BIGINT (the ×2
    * clears the ½-per-tied-pair), floored once to basis points at the
    * end. No per-pair join (P·N pairs) is ever materialized.
    *
    * Scale shape: two user-keyed aggs (spend, per-type counts) + the
    * bucketed ScalableRank split; the AUC windows run over the
    * (type, score) cell frame — score is an activity COUNT, so the cell
    * alphabet is bounded by the per-user activity range, not the corpus
    * (the q189/q149 bounded-frame argument). The |types|-row distinct
    * frame broadcasts for the zero-fill.
    */
  def q191_auc_roc(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val spend = ev.groupBy(col("user_id")).agg(sum(col("cents")).as("cents"))
    val lab = graft.functions.ScalableRank
      .rowNumbers(spend, Seq.empty, "cents", "user_id")
      .select(col("user_id"),
        when(col("rn") * 2 > col("n"), 1L).otherwise(0L).as("pos"))
    val ty = ev.select(col("event_type")).distinct()
    val cnt = ev.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("score"))
    val f = lab.crossJoin(broadcast(ty))
      .join(cnt, Seq("user_id", "event_type"), "left")
      .select(col("event_type"), col("pos"),
        coalesce(col("score"), lit(0L)).as("score"))
    val cell = f.groupBy(col("event_type"), col("score"))
      .agg(sum(col("pos")).as("p"), sum(lit(1L) - col("pos")).as("q"))
    val wt = Window.partitionBy(col("event_type"))
    val wBelow = Window.partitionBy(col("event_type")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    cell
      .withColumn("qbelow", coalesce(sum(col("q")).over(wBelow), lit(0L)))
      .withColumn("np", sum(col("p")).over(wt))
      .withColumn("nq", sum(col("q")).over(wt))
      .groupBy(col("event_type"))
      .agg(max(col("np")).as("n_pos"), max(col("nq")).as("n_neg"),
        sum(col("p") * (col("qbelow") * 2 + col("q"))).as("u2"))
      .select(col("event_type"), col("n_pos"), col("n_neg"),
        expr("u2 * 10000 div nullif(2 * n_pos * n_neg, 0)").as("auc_bp"))
      .orderBy(col("event_type"))
  }

  /** Kaplan–Meier time-to-convert survival curve (q192): the
    * product-limit estimator over days from a user's first event to
    * first purchase, censoring never-converters at the corpus horizon —
    * the right-censoring-aware upgrade of q166's converter-only
    * latency percentiles (dropping censored users biases conversion
    * speed optimistic; KM charges them to every day they survived).
    *
    * Exactness: survival is reported in LOG space — per duration cell,
    * term = round(ln((n_risk−d)/n_risk)·10⁶) micro-nats rounded ONCE
    * (the q111/q181 discipline), and the curve is the integer running
    * sum of terms (order-independent, no float product chain to
    * re-associate). Once a cell extinguishes the risk set (d = n_risk,
    * survival 0, log −∞) the curve emits NULL from that point — pinned
    * identically in both engines.
    *
    * Scale shape: one user-keyed agg collapses the log to one row per
    * user; the duration cells and both windows are calendar-bounded
    * (≤ observation days — the q150/q171 single-task bound), so the
    * unpartitioned window never sees more than the day alphabet. The
    * 1-row horizon broadcasts.
    */
  def q192_kaplan_meier(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr(Det.epochDaySql("ts")).as("day"), col("event_type"))
    val per = d.groupBy(col("user_id"))
      .agg(min(col("day")).as("f"),
        min(when(col("event_type") === "purchase", col("day"))).as("p"))
    val mx = d.agg(max(col("day")).as("md"))
    val u = per.crossJoin(broadcast(mx))
      .select(
        when(col("p").isNotNull, col("p") - col("f"))
          .otherwise(col("md") - col("f")).as("t"),
        when(col("p").isNotNull, 1L).otherwise(0L).as("ev"))
    val cell = u.groupBy(col("t"))
      .agg(sum(col("ev")).as("d_t"), sum(lit(1L) - col("ev")).as("c_t"),
        count(lit(1)).as("a"))
    val wRisk = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cell
      .withColumn("n_risk", sum(col("a")).over(wRisk))
      .withColumn("term",
        when(col("d_t") > 0 && col("n_risk") > col("d_t"),
          round(log((col("n_risk") - col("d_t")).cast("double") /
            col("n_risk").cast("double")) * 1000000).cast("long"))
          .otherwise(lit(0L)))
      .withColumn("ext",
        max(when(col("d_t") === col("n_risk"), 1L).otherwise(0L)).over(wCum))
      .withColumn("cum", sum(col("term")).over(wCum))
      .select(col("t").as("t_days"), col("n_risk"),
        col("d_t").as("n_events"), col("c_t").as("n_censored"),
        when(col("ext") === 1L, lit(null).cast("long"))
          .otherwise(col("cum")).as("surv_unat"))
      .orderBy(col("t_days"))
  }

  /** Gini concentration of spend (q194): per event type, the Gini
    * coefficient of per-user cent totals under the exact rank identity
    * G = (2·Σ rn·x_rn − (n+1)·Σx) / (n·Σx) with x sorted (cents,
    * user_id) ascending — the whale-dependence readout behind q147's
    * Pareto/ABC classes and q188's gains table (one scalar per type a
    * monitor can alert on: revenue concentration drifting up means
    * rising top-user risk).
    *
    * Exactness: ranks come from [[graft.functions.ScalableRank]] (exact
    * integral rn under value skew), Σ rn·cents and Σ cents are BIGINT
    * sums, and the single floor to basis points happens last —
    * nullif-guarded (sums past ~10¹⁴ cents·rank widen to decimal, the
    * q168 note, plan unchanged).
    *
    * Scale shape: one (type, user) two-phase agg collapses the log; the
    * ranking is ScalableRank's bucketed two-phase form (max task =
    * idBucketWidth under any spend skew — never one task per type); the
    * final agg is |types| rows.
    */
  def q194_gini_spend(spark: SparkSession, sfDir: String): DataFrame = {
    val per = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("cents")).as("cents"))
    graft.functions.ScalableRank
      .rowNumbers(per, Seq("event_type"), "cents", "user_id")
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_users"), sum(col("cents")).as("total_cents"),
        sum(col("rn") * col("cents")).as("src"))
      .select(col("event_type"), col("n_users"), col("total_cents"),
        expr("(2 * src - (n_users + 1) * total_cents) * 10000 " +
          "div nullif(n_users * total_cents, 0)").as("gini_bp"))
      .orderBy(col("event_type"))
  }

  /** Behavioral diversity per user (q195): Shannon entropy of each
    * user's event-type distribution — the q112 character-entropy
    * discipline lifted to the behavioral level. Bots and scripted
    * accounts sit at the extremes (single-type ⇒ 0; uniform sweep ⇒
    * ln|types|); organic users land in a band. The per-(user, type)
    * contribution −n_t·ln(n_t/n) is quantized to integer milli-nats
    * ONCE before summing (order-independent integer agg — no float
    * accumulation race), entropy = sum div n.
    *
    * Scale shape: one (user, type) two-phase count agg collapses the
    * log; the per-user rollup joins on the SAME user_id partitioning
    * (exchange-free on a bucketed store); per-user state is the
    * |types|-bounded alphabet.
    */
  def q195_user_entropy(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val u = c.groupBy(col("user_id"))
      .agg(sum(col("n")).as("tot"), count(lit(1)).as("n_types"))
    c.join(u, "user_id")
      .withColumn("mnat",
        round(-log(col("n").cast("double") / col("tot").cast("double"))
          * col("n") * 1000).cast("long"))
      .groupBy(col("user_id"))
      .agg(max(col("tot")).as("n_events"), max(col("n_types")).as("n_types"),
        sum(col("mnat")).as("sum_mnat"))
      .select(col("user_id"), col("n_events"), col("n_types"),
        col("sum_mnat"), expr("sum_mnat div n_events").as("entropy_mnat"))
      .orderBy(col("user_id"))
  }

  /** New-vs-returning growth accounting (q196): per day, DAU split into
    * first-ever-seen and returning users plus the returning share in bp
    * — the growth-accounting decomposition (acquisition vs retention)
    * that q138's DAU/WAU ratio doesn't separate: stickiness can hold
    * steady while the NEW inflow silently dies.
    *
    * Scale shape: one distinct (user, day) pass, a user-keyed min-agg
    * for the first day, and a user_id join back on the SAME
    * partitioning — then a |days|-row final agg. Exchange-free on a
    * user-bucketed store; nothing after the join exceeds the calendar.
    */
  def q196_new_returning(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr(Det.epochDaySql("ts")).as("day"))
      .distinct()
    val f = d.groupBy(col("user_id")).agg(min(col("day")).as("fd"))
    d.join(f, "user_id")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("dau"),
        sum(when(col("day") === col("fd"), 1L).otherwise(0L))
          .as("new_users"),
        sum(when(col("day") > col("fd"), 1L).otherwise(0L))
          .as("returning_users"))
      .select(col("day"), col("dau"), col("new_users"),
        col("returning_users"),
        expr("returning_users * 10000 div dau").as("returning_bp"))
      .orderBy(col("day"))
  }

  /** Cross-population quantile normalization (q198): each event's cent
    * value is mapped onto the REFERENCE distribution ('view' events) at
    * the same quantile — the rank-preserving calibration that makes
    * scores comparable across heterogeneous populations (the
    * microarray quantile-normalization / feature-scaling shape;
    * q174's ECDF is the first half, this adds the inverse-CDF of the
    * reference). 'view' rows map to themselves (identity sanity, exact
    * at every rank).
    *
    * Exactness: pct_bp = rn·10⁴ div n from [[graft.functions.ScalableRank]]
    * (q174's integral ECDF); norm_cents = min reference cents whose
    * reference ECDF ≥ pct_bp — the same crossing rule as
    * [[graft.functions.ExactPercentile]], realized as a complete
    * 10001-row bp→cents lookup table so the corpus-side mapping is a
    * broadcast EQUI-join, never a per-row range probe.
    *
    * Scale shape: the ranking is ScalableRank's bucketed two-phase
    * form; the reference cell frame is value-alphabet-bounded and the
    * grid is a constant 10001 rows (their crossing join is
    * bounded×bounded); the only corpus-sized operations are the rank
    * and one broadcast hash join on pct_bp.
    */
  def q198_quantile_normalize(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val p = graft.functions.ScalableRank
      .rowNumbers(e, Seq("event_type"), "cents", "event_id")
      .select(col("event_id"), col("event_type"), col("cents"),
        expr("rn * 10000 div n").as("pct_bp"))
    val vc = e.filter(col("event_type") === "view")
      .groupBy(col("cents")).agg(count(lit(1)).as("c"))
    val wCum = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val vcum = vc
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("tot", sum(col("c")).over(Window.partitionBy()))
      .select(col("cents"), expr("cum * 10000 div tot").as("cum_bp"))
    // bp→cents lookup WITHOUT the grid theta-join (round 13, guide §1.2):
    // `grid.join(vcum, cum_bp >= bp).groupBy(bp).min(cents)` is a
    // 10001×|cents| nested-loop probe — measured 3.25 s of task time at
    // sf0.1, the query's single hottest stage. The crossing rule is a
    // step function over the MONOTONE cum_bp column, so each reference
    // row i covers exactly the bps in (cum_bp_{i-1}, cum_bp_i] (the
    // first row covers [0, cum_bp_1]); emitting that range per row via
    // lag + sequence + explode produces the IDENTICAL 10001-row table —
    // min(cents) per bp falls out of range disjointness, no grid, no
    // groupBy, O(|cents| + 10001) instead of O(|cents|·10001). Rows
    // whose cum_bp repeats a predecessor's (integer-div collisions)
    // cover an empty range and are dropped by the guard — exactly the
    // rows min() discarded.
    val wLag = Window.orderBy(col("cents"))
    val lut = vcum
      .withColumn("prev", lag(col("cum_bp"), 1, -1L).over(wLag))
      .filter(col("cum_bp") > col("prev"))
      .select(explode(sequence(col("prev") + 1L, col("cum_bp"))).as("bp"),
        col("cents").as("norm_cents"))
    p.join(broadcast(lut), col("bp") === col("pct_bp"))
      .select(col("event_id"), col("event_type"), col("cents"),
        col("pct_bp"), col("norm_cents"))
      .orderBy(col("event_id"))
  }

  /** Population Stability Index drift screen (q207): per event type, the
    * PSI between the FIRST and SECOND half of the event calendar over the
    * q132 fixed value buckets — the model-monitoring standard for "has
    * this feature's distribution moved" (PSI < 0.1 stable, 0.1–0.25
    * drifting, > 0.25 action), completing the drift family: q113 is KL
    * across sources, q149 χ² tests association, q189 KS reads the max
    * ECDF gap, PSI is the symmetric binned score ops teams alert on.
    *
    * Exactness: the calendar midpoint is integer epoch-day arithmetic off
    * a 1-row broadcast (q192's horizon pattern); buckets are
    * `least(cents div 5000, 9)` — pure BIGINT, engine-identical floors on
    * non-negative cents; add-one smoothing over the OBSERVED (type,
    * bucket) grid makes every share strictly positive with no ε constant;
    * each bucket's (pA−pB)·ln(pA/pB) term is rounded ONCE to integer
    * micro-nats (the q111/q181 single-quantization discipline), so the
    * per-type sum is partition-order-free. Every term is ≥ 0 (x−y and
    * ln(x/y) share sign), so PSI ≥ 0 exactly.
    *
    * Scale shape: ONE two-phase (type, bucket) conditional agg collapses
    * the log; the smoothing totals ride as windows over the
    * alphabet-bounded cell frame (|types|·10 rows); nothing corpus-sized
    * survives the first agg.
    */
  def q207_psi_drift(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr(Det.epochDaySql("ts")).as("day"),
        expr("least(cast(round(value * 100) as bigint) div 5000, 9L)")
          .as("bucket"))
    val mid = e.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
    val cells = e.crossJoin(broadcast(mid))
      .groupBy(col("event_type"), col("bucket"))
      .agg(sum(when(col("day") < col("mid"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("day") >= col("mid"), 1L).otherwise(0L)).as("cb"))
    val wT = Window.partitionBy(col("event_type"))
    val pa = (col("ca") + 1).cast("double") /
      (col("na") + col("k")).cast("double")
    val pb = (col("cb") + 1).cast("double") /
      (col("nb") + col("k")).cast("double")
    cells
      .withColumn("na", sum(col("ca")).over(wT))
      .withColumn("nb", sum(col("cb")).over(wT))
      .withColumn("k", count(lit(1)).over(wT))
      .withColumn("term",
        round((pa - pb) * log(pa / pb) * 1000000.0).cast("long"))
      .groupBy(col("event_type"))
      .agg(max(col("na")).as("n_first"), max(col("nb")).as("n_second"),
        max(col("k")).as("n_buckets"), sum(col("term")).as("psi_unat"))
      .orderBy(col("event_type"))
  }

  /** Daily session-quality KPIs (q209): the report layer over q131's
    * per-event sessionization — per session-START day: session count,
    * bounce share (single-event sessions, the canonical engagement
    * alarm), total session time, and mean events per session. q131
    * builds the session table; this is the rollup a product dashboard
    * actually renders from it (bounce spikes are how instrumentation
    * breaks and bot floods surface).
    *
    * Exactness: sessions come from [[Sessionize.assign]] (the declared
    * q131 operator — strict-gap rule, event_id tie-break, replayed
    * verbatim in the oracle CTE); durations stay exact integer µs until
    * ONE floor to seconds on the daily sum; the events-per-session mean
    * floors once to milli-events.
    *
    * Scale shape: the session pass is q131's single user_id
    * window+agg partitioning (exchange-free on a user-bucketed layout);
    * the daily rollup is a second two-phase agg whose input is already
    * one row per session; the output frame is calendar-bounded.
    */
  def q209_session_stats(spark: SparkSession, sfDir: String): DataFrame =
    Sessionize.assign(Tables.events(spark, sfDir), Seq("user_id"), "ts",
        gap = "30 MINUTE", tieBreak = Seq("event_id"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("start_us"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .as("dur_us"))
      .select(expr(Det.floorDivSql("start_us", "86400000000")).as("day"),
        col("n_events"), col("dur_us"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("n_bounce"),
        sum(col("dur_us")).as("sum_dur_us"),
        sum(col("n_events")).as("sum_events"))
      .select(col("day"), col("n_sessions"), col("n_bounce"),
        expr("n_bounce * 10000 div n_sessions").as("bounce_bp"),
        expr("sum_dur_us div 1000000").as("total_dur_s"),
        expr("sum_events * 1000 div n_sessions").as("events_milli"))
      .orderBy(col("day"))

  /** Herfindahl–Hirschman spend concentration (q214): per event type,
    * HHI = Σ (user share in bp)² over per-user cent totals — the
    * antitrust-style concentration scalar next to q194's Gini (Gini
    * reads inequality of the whole curve; HHI is dominated by the
    * largest players, which is why platform-risk reviews quote it:
    * < 1.5·10⁷ unconcentrated, > 2.5·10⁷ highly concentrated in bp²
    * units). One whale leaving moves HHI before it moves revenue.
    *
    * Exactness: shares floor ONCE to integer bp (the documented
    * quantization — Σshare_bp ≤ 10⁴ with the remainder lost to floors,
    * identical in both engines), squares and sums are exact BIGINTs
    * bounded by 10⁸.
    *
    * Scale shape: one (type, user) two-phase agg collapses the log; the
    * totals re-aggregate from that frame (no second scan) and join back
    * broadcast (|types| rows); the HHI agg runs on the user-frame with
    * map-side partials. No window touches a user-sized partition.
    */
  def q214_hhi_spend(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("cents")).as("ucents"))
    val tot = cells.groupBy(col("event_type"))
      .agg(sum(col("ucents")).as("tcents"), count(lit(1)).as("n_users"))
    cells.join(broadcast(tot), "event_type")
      .withColumn("share_bp", expr("ucents * 10000 div tcents"))
      .groupBy(col("event_type"))
      .agg(max(col("n_users")).as("n_users"),
        max(col("tcents")).as("total_cents"),
        sum(col("share_bp") * col("share_bp")).as("hhi"))
      .orderBy(col("event_type"))
  }

  /** Churn-state decomposition by signup cohort (q218): each user's
    * lifecycle state at the corpus horizon — active (seen on the
    * horizon day), lapsing (1 day stale), churned (older) — split by
    * first-seen epoch WEEK. The growth-accounting complement of q120
    * (which reads week-k return RATES) and q196 (daily inflow): this is
    * the STOCK view a retention review opens with ("of the March
    * cohort, what share is still alive today?"), and the population the
    * q188/q183 models actually score. The 0/1-day recency thresholds
    * are fixture-compressed knobs (the synthetic log is 30 dense days;
    * a production deployment runs 7/30 — the q144 `% 3` rule: a
    * fixture-size bound, not semantics).
    *
    * Exactness: one user-keyed agg yields (first, last) epoch days;
    * cohort week = (day + 3) div 7 (Monday-aligned pure integer
    * arithmetic — no engine calendar functions); recency in exact
    * integer days off a 1-row horizon broadcast; shares floor once per
    * (cohort, state) against window-summed cohort sizes.
    *
    * Scale shape: one user_id two-phase agg collapses the log
    * (exchange-free on a user-bucketed layout); everything after runs
    * on the |weeks|×3 frame.
    */
  def q218_churn_state(spark: SparkSession, sfDir: String): DataFrame = {
    val u = Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr(Det.epochDaySql("ts")).as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val h = u.agg(max(col("d1")).as("hday"))
    u.crossJoin(broadcast(h))
      .select(expr(Det.floorDivSql("d0 + 3", "7")).as("cohort_week"),
        (col("hday") - col("d1")).as("age"))
      .select(col("cohort_week"),
        when(col("age") === 0, "1_active")
          .when(col("age") === 1, "2_lapsing")
          .otherwise("3_churned").as("state"))
      .groupBy(col("cohort_week"), col("state"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("share_bp",
        expr("n_users * 10000 div sum(n_users) over " +
          "(partition by cohort_week)"))
      .orderBy(col("cohort_week"), col("state"))
  }

  /** Daily purchase-value percentile bands (q221): per day the exact
    * p10/p50/p90 of purchase cents — the metrics-dashboard band chart
    * (and the latency-percentile shape applied to money). q27/q136 read
    * per-TYPE distributions once; this is the same discipline laid out
    * along the calendar, where a p90 drifting away from a flat p50
    * says the whale tail is moving before any mean-based monitor fires.
    *
    * Exactness: integer crossing rule on the (day, cents) histogram
    * (cum·10 ≥ n, cum·2 ≥ n, cum·10 ≥ n·9 — the q166 lower-percentile
    * convention; no interpolation, no float).
    *
    * Scale shape: the log collapses into a (day, cents) two-phase
    * histogram; the cumulative window and the selection run over the
    * per-day value alphabet (the ExactPercentile argument) — group
    * SIZE never bounds executor memory.
    */
  def q221_value_bands(spark: SparkSession, sfDir: String): DataFrame = {
    val hist = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(expr(Det.epochDaySql("ts")).as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("day"), col("cents"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("day")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("day"))))
      .groupBy(col("day"))
      .agg(max(col("n")).as("n_purch"),
        min(when(col("cum") * 10 >= col("n"), col("cents"))).as("p10_c"),
        min(when(col("cum") * 2 >= col("n"), col("cents"))).as("p50_c"),
        min(when(col("cum") * 10 >= col("n") * 9, col("cents")))
          .as("p90_c"))
      .orderBy(col("day"))
  }

  /** Position-based (U-shaped) multi-touch attribution (q222): each
    * purchase's cents split across the user's touch events (view/click)
    * that precede it — 40% to the first touch, 40% to the last, the
    * middle 20% split evenly — rolled up per touch channel. The
    * multi-touch twin of q126's last-touch: last-touch systematically
    * over-credits the bottom-of-funnel channel; U-shaped is the
    * standard first/last compromise marketing teams actually report.
    *
    * Each touch attributes to its NEXT purchase (the q126 framing,
    * direction reversed): one descending-carry window pins (purchase
    * id, purchase cents) onto every preceding touch — no touch×purchase
    * join exists. Credit rule: k=1 → 10⁴ bp, k=2 → 5000/5000, else
    * 4000/4000 ends + 2000 div (k−2) per middle (floored — the
    * remainder bp are deliberately dropped, documented; per-touch
    * credit then floors once to cents).
    *
    * Scale shape: ONE user_id partitioning end to end — the carry
    * window, the (user, purchase) position windows, and the final
    * |channels|-row rollup; exchange-free on a user-bucketed layout.
    */
  def q222_position_attribution(spark: SparkSession,
                                sfDir: String): DataFrame = {
    val wCarry = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
      .rowsBetween(1, Window.unboundedFollowing)
    val isP = col("event_type") === "purchase"
    val touches = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      // both carries in ONE select → one Window operator (q126 rule)
      .select(col("*"),
        first(when(isP, col("event_id")), ignoreNulls = true)
          .over(wCarry).as("pid"),
        first(when(isP, col("cents")), ignoreNulls = true)
          .over(wCarry).as("p_cents"))
      .filter(col("event_type").isin("view", "click") &&
        col("pid").isNotNull)
    val wPos = Window.partitionBy(col("user_id"), col("pid"))
      .orderBy(col("us").asc, col("event_id").asc)
    touches
      .withColumn("rn", row_number().over(wPos).cast("long"))
      .withColumn("k",
        count(lit(1)).over(Window.partitionBy(col("user_id"), col("pid"))))
      .withColumn("credit_bp",
        when(col("k") === 1, 10000L)
          .when(col("k") === 2, 5000L)
          .when(col("rn") === 1 || col("rn") === col("k"), 4000L)
          .otherwise(expr("2000 div (k - 2)")))
      .withColumn("credit_cents", expr("p_cents * credit_bp div 10000"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit_cents")).as("credit_cents"))
      .orderBy(col("event_type"))
  }

  /** Audience-overlap matrix (q225): for every event-type pair WITH AT
    * LEAST ONE shared user, the distinct-user intersection and Jaccard in
    * bp — "do buyers also click, and are error-seers a separate
    * population?" Fully DISJOINT pairs are omitted by construction (the
    * intersection is an inner join on shared users, so a zero-overlap
    * pair produces no row): absence from the output IS the
    * jaccard_bp = 0 verdict, the same sparse-matrix convention as q154's
    * lift table — a consumer that needs the dense grid left-joins this
    * against the type cross product with coalesce(n_both, 0). The
    * set-level companion of q154 (co-occurrence lift reads FREQUENCY,
    * this reads MEMBERSHIP) and the input to any audience-expansion
    * decision.
    *
    * Exactness: pure distinct-set counts; Jaccard floors once against
    * the inclusion–exclusion union (nA + nB − inter > 0 whenever the
    * pair is present).
    *
    * Scale shape: one distinct (user, type) pass (the log's natural
    * key); the per-user self-pair fan-out is alphabet-bounded (≤
    * |types|² rows per user); type sizes join back broadcast (|types|
    * rows each side). No window touches a user-sized partition.
    */
  def q225_audience_overlap(spark: SparkSession, sfDir: String): DataFrame = {
    val ut = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).distinct()
    val a = ut.select(col("user_id").as("ua"), col("event_type").as("ta"))
    val b = ut.select(col("user_id").as("ub"), col("event_type").as("tb"))
    val inter = a.join(b, col("ua") === col("ub") && col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("n_both"))
    val sa = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n_a"))
      .select(col("event_type").as("sta"), col("n_a"))
    val sb = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n_b"))
      .select(col("event_type").as("stb"), col("n_b"))
    inter
      .join(broadcast(sa), col("ta") === col("sta"))
      .join(broadcast(sb), col("tb") === col("stb"))
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("n_a"), col("n_b"), col("n_both"),
        expr("n_both * 10000 div (n_a + n_b - n_both)").as("jaccard_bp"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val oracle: Map[String, String] = Map(
    "q222_position_attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS us,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |c AS (SELECT user_id, event_id, event_type, us,
        |    first_value(CASE WHEN event_type = 'purchase' THEN event_id END
        |      IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS pid,
        |    first_value(CASE WHEN event_type = 'purchase' THEN cents END
        |      IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS p_cents
        |  FROM e),
        |t AS (SELECT * FROM c
        |  WHERE event_type IN ('view', 'click') AND pid IS NOT NULL),
        |p AS (SELECT event_type, p_cents,
        |    CAST(row_number() OVER (PARTITION BY user_id, pid
        |      ORDER BY us, event_id) AS BIGINT) AS rn,
        |    count(*) OVER (PARTITION BY user_id, pid) AS k
        |  FROM t),
        |w AS (SELECT event_type, p_cents,
        |    CASE WHEN k = 1 THEN 10000 WHEN k = 2 THEN 5000
        |      WHEN rn = 1 OR rn = k THEN 4000
        |      ELSE 2000 // (k - 2) END AS credit_bp
        |  FROM p)
        |SELECT event_type, count(*) AS n_touches,
        |  CAST(sum(p_cents * credit_bp // 10000) AS BIGINT) AS credit_cents
        |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q225_audience_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |i AS (SELECT a.event_type AS ta, b.event_type AS tb,
        |    count(*) AS n_both
        |  FROM ut a JOIN ut b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2),
        |s AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1)
        |SELECT i.ta AS type_a, i.tb AS type_b,
        |  sa.n AS n_a, sb.n AS n_b, i.n_both,
        |  CAST(i.n_both * 10000 // (sa.n + sb.n - i.n_both) AS BIGINT)
        |    AS jaccard_bp
        |FROM i JOIN s sa ON i.ta = sa.event_type
        |  JOIN s sb ON i.tb = sb.event_type
        |ORDER BY type_a, type_b""".stripMargin,
    "q218_churn_state" ->
      """WITH u AS (SELECT user_id,
        |    min(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS d0,
        |    max(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS d1
        |  FROM events GROUP BY user_id),
        |h AS (SELECT max(d1) AS hday FROM u),
        |s AS (SELECT (d0 + 3 - (((d0 + 3) % 7) + 7) % 7) // 7 AS cohort_week,
        |    CASE WHEN hday - d1 = 0 THEN '1_active'
        |    WHEN hday - d1 = 1 THEN '2_lapsing'
        |    ELSE '3_churned' END AS state
        |  FROM u, h),
        |g AS (SELECT cohort_week, state, count(*) AS n_users
        |  FROM s GROUP BY 1, 2)
        |SELECT cohort_week, state, n_users,
        |  CAST(n_users * 10000 // sum(n_users)
        |    OVER (PARTITION BY cohort_week) AS BIGINT) AS share_bp
        |FROM g ORDER BY cohort_week, state""".stripMargin,
    "q221_value_bands" ->
      """WITH hist AS (SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents, count(*) AS c
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |w AS (SELECT day, cents,
        |    sum(c) OVER (PARTITION BY day ORDER BY cents
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(c) OVER (PARTITION BY day) AS n FROM hist)
        |SELECT day, CAST(max(n) AS BIGINT) AS n_purch,
        |  min(CASE WHEN cum * 10 >= n THEN cents END) AS p10_c,
        |  min(CASE WHEN cum * 2 >= n THEN cents END) AS p50_c,
        |  min(CASE WHEN cum * 10 >= n * 9 THEN cents END) AS p90_c
        |FROM w GROUP BY day ORDER BY day""".stripMargin,
    "q214_hhi_spend" ->
      """WITH c AS (SELECT event_type, user_id,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS ucents
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(ucents) AS BIGINT) AS tcents,
        |    count(*) AS n_users FROM c GROUP BY 1),
        |s AS (SELECT c.event_type, t.n_users, t.tcents,
        |    ucents * 10000 // tcents AS share_bp
        |  FROM c JOIN t ON c.event_type = t.event_type)
        |SELECT event_type, CAST(max(n_users) AS BIGINT) AS n_users,
        |  CAST(max(tcents) AS BIGINT) AS total_cents,
        |  CAST(sum(share_bp * share_bp) AS BIGINT) AS hhi
        |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q207_psi_drift" ->
      """WITH e AS (SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    LEAST(CAST(round(value * 100) AS BIGINT) // 5000, 9) AS bucket
        |  FROM events),
        |m AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM e),
        |c AS (SELECT event_type, bucket,
        |    CAST(sum(CASE WHEN day < mid THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN day >= mid THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM e, m GROUP BY event_type, bucket),
        |t AS (SELECT event_type, bucket, ca, cb,
        |    sum(ca) OVER (PARTITION BY event_type) AS na,
        |    sum(cb) OVER (PARTITION BY event_type) AS nb,
        |    count(*) OVER (PARTITION BY event_type) AS k
        |  FROM c),
        |s AS (SELECT event_type, na, nb, k,
        |    CAST(round((CAST(ca + 1 AS DOUBLE) / CAST(na + k AS DOUBLE)
        |        - CAST(cb + 1 AS DOUBLE) / CAST(nb + k AS DOUBLE))
        |      * ln((CAST(ca + 1 AS DOUBLE) / CAST(na + k AS DOUBLE))
        |        / (CAST(cb + 1 AS DOUBLE) / CAST(nb + k AS DOUBLE)))
        |      * 1000000) AS BIGINT) AS term
        |  FROM t)
        |SELECT event_type, CAST(max(na) AS BIGINT) AS n_first,
        |  CAST(max(nb) AS BIGINT) AS n_second,
        |  CAST(max(k) AS BIGINT) AS n_buckets,
        |  CAST(sum(term) AS BIGINT) AS psi_unat
        |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q209_session_stats" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ts
        |  FROM events),
        |s AS (SELECT user_id, ts,
        |    sum(CASE WHEN prev_ts IS NULL
        |          OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM e),
        |g AS (SELECT user_id, session_seq, count(*) AS n_events,
        |    epoch_us(min(ts)) AS start_us,
        |    CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS dur_us
        |  FROM s GROUP BY 1, 2),
        |d AS (SELECT (start_us - ((start_us % 86400000000) + 86400000000)
        |      % 86400000000) // 86400000000 AS day, n_events, dur_us
        |  FROM g)
        |SELECT day, count(*) AS n_sessions,
        |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bounce,
        |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 10000
        |    // count(*) AS BIGINT) AS bounce_bp,
        |  CAST(sum(dur_us) // 1000000 AS BIGINT) AS total_dur_s,
        |  CAST(sum(n_events) * 1000 // count(*) AS BIGINT) AS events_milli
        |FROM d GROUP BY day ORDER BY day""".stripMargin,
    "q198_quantile_normalize" ->
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |r AS (SELECT event_id, event_type, cents,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY cents, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM e),
        |p AS (SELECT event_id, event_type, cents,
        |    rn * 10000 // n AS pct_bp FROM r),
        |vc AS (SELECT cents, count(*) AS c FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |vcum AS (SELECT cents,
        |    sum(c) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      * 10000 // (SELECT sum(c) FROM vc) AS cum_bp FROM vc),
        |grid AS (SELECT i AS bp FROM range(0, 10001) AS t(i)),
        |lut AS (SELECT g.bp, min(v.cents) AS norm_cents
        |  FROM grid g JOIN vcum v ON v.cum_bp >= g.bp GROUP BY g.bp)
        |SELECT p.event_id, p.event_type, p.cents,
        |  CAST(p.pct_bp AS BIGINT) AS pct_bp,
        |  CAST(l.norm_cents AS BIGINT) AS norm_cents
        |FROM p JOIN lut l ON l.bp = p.pct_bp
        |ORDER BY p.event_id""".stripMargin,
    "q195_user_entropy" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |u AS (SELECT user_id, sum(n) AS tot, count(*) AS n_types
        |  FROM c GROUP BY 1),
        |k AS (SELECT c.user_id, u.tot, u.n_types,
        |    CAST(round(-ln(CAST(c.n AS DOUBLE) / u.tot) * c.n * 1000)
        |      AS BIGINT) AS mnat
        |  FROM c JOIN u USING (user_id))
        |SELECT user_id, CAST(max(tot) AS BIGINT) AS n_events,
        |  CAST(max(n_types) AS BIGINT) AS n_types,
        |  CAST(sum(mnat) AS BIGINT) AS sum_mnat,
        |  CAST(sum(mnat) // max(tot) AS BIGINT) AS entropy_mnat
        |FROM k GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q196_new_returning" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS fd FROM d GROUP BY 1)
        |SELECT day, count(*) AS dau,
        |  CAST(sum(CASE WHEN day = fd THEN 1 ELSE 0 END) AS BIGINT)
        |    AS new_users,
        |  CAST(sum(CASE WHEN day > fd THEN 1 ELSE 0 END) AS BIGINT)
        |    AS returning_users,
        |  CAST(sum(CASE WHEN day > fd THEN 1 ELSE 0 END) * 10000
        |    // count(*) AS BIGINT) AS returning_bp
        |FROM d JOIN f USING (user_id) GROUP BY day ORDER BY day""".stripMargin,
    "q191_auc_roc" ->
      """WITH ev AS (SELECT user_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |spend AS (SELECT user_id, CAST(sum(cents) AS BIGINT) AS cents
        |  FROM ev GROUP BY user_id),
        |lab AS (SELECT user_id,
        |    CASE WHEN 2 * row_number() OVER (ORDER BY cents, user_id)
        |      > count(*) OVER () THEN 1 ELSE 0 END AS pos FROM spend),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |cnt AS (SELECT user_id, event_type, count(*) AS score
        |  FROM ev GROUP BY 1, 2),
        |f AS (SELECT t.event_type, l.pos, coalesce(c.score, 0) AS score
        |  FROM lab l CROSS JOIN ty t
        |  LEFT JOIN cnt c ON c.user_id = l.user_id
        |    AND c.event_type = t.event_type),
        |cell AS (SELECT event_type, score, CAST(sum(pos) AS BIGINT) AS p,
        |    CAST(sum(1 - pos) AS BIGINT) AS q FROM f GROUP BY 1, 2),
        |w AS (SELECT event_type, score, p, q,
        |    coalesce(sum(q) OVER (PARTITION BY event_type ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS qbelow,
        |    sum(p) OVER (PARTITION BY event_type) AS np,
        |    sum(q) OVER (PARTITION BY event_type) AS nq FROM cell)
        |SELECT event_type, CAST(max(np) AS BIGINT) AS n_pos,
        |  CAST(max(nq) AS BIGINT) AS n_neg,
        |  CAST(sum(p * (2 * qbelow + q)) * 10000
        |    // nullif(2 * max(np) * max(nq), 0) AS BIGINT) AS auc_bp
        |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q192_kaplan_meier" ->
      """WITH d AS (SELECT user_id, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    event_type FROM events),
        |per AS (SELECT user_id, min(day) AS f,
        |    min(CASE WHEN event_type = 'purchase' THEN day END) AS p
        |  FROM d GROUP BY user_id),
        |mx AS (SELECT max(day) AS md FROM d),
        |u AS (SELECT CASE WHEN p IS NOT NULL THEN p - f ELSE md - f END AS t,
        |    CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS ev FROM per, mx),
        |cell AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d_t,
        |    CAST(sum(1 - ev) AS BIGINT) AS c_t, count(*) AS a
        |  FROM u GROUP BY t),
        |r AS (SELECT t, d_t, c_t,
        |    sum(a) OVER (ORDER BY t
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
        |  FROM cell),
        |s AS (SELECT t, n_risk, d_t, c_t,
        |    max(CASE WHEN d_t = n_risk THEN 1 ELSE 0 END)
        |      OVER (ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ext,
        |    sum(CASE WHEN d_t > 0 AND n_risk > d_t
        |        THEN CAST(round(ln(CAST(n_risk - d_t AS DOUBLE) / n_risk)
        |          * 1000000) AS BIGINT) ELSE 0 END)
        |      OVER (ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM r)
        |SELECT t AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
        |  d_t AS n_events, c_t AS n_censored,
        |  CASE WHEN ext = 1 THEN NULL ELSE cum END AS surv_unat
        |FROM s ORDER BY t_days""".stripMargin,
    "q194_gini_spend" ->
      """WITH per AS (SELECT event_type, user_id,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY cents, user_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n,
        |    sum(cents) OVER (PARTITION BY event_type) AS tot FROM per)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n_users,
        |  CAST(max(tot) AS BIGINT) AS total_cents,
        |  CAST((2 * sum(rn * cents) - (max(n) + 1) * max(tot)) * 10000
        |    // nullif(max(n) * max(tot), 0) AS BIGINT) AS gini_bp
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q188_decile_gains" ->
      """WITH per AS (SELECT user_id,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS score,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS resp
        |  FROM events GROUP BY user_id),
        |r AS (SELECT resp,
        |    row_number() OVER (ORDER BY score DESC, user_id ASC) AS rn,
        |    count(*) OVER () AS n FROM per),
        |a AS (SELECT (rn - 1) * 10 // n + 1 AS decile, count(*) AS n_users,
        |    CAST(sum(resp) AS BIGINT) AS n_resp FROM r GROUP BY 1),
        |t AS (SELECT CAST(sum(n_users) AS BIGINT) AS tot_u,
        |    CAST(sum(n_resp) AS BIGINT) AS tot_r FROM a),
        |c AS (SELECT decile, n_users, n_resp,
        |    sum(n_resp) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_r
        |  FROM a)
        |SELECT decile, n_users, n_resp,
        |  CAST(n_resp * 10000 // n_users AS BIGINT) AS resp_bp,
        |  CAST((n_resp * 10000 // n_users) * 1000
        |    // nullif(tot_r * 10000 // tot_u, 0) AS BIGINT) AS lift_milli,
        |  CAST(cum_r * 10000 // nullif(tot_r, 0) AS BIGINT) AS cum_capture_bp
        |FROM c, t ORDER BY decile""".stripMargin,
    "q189_ks_drift" ->
      """WITH e AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 4) < '8000'
        |      THEN 1 ELSE 0 END AS ina
        |  FROM events),
        |cell AS (SELECT event_type, cents, CAST(sum(ina) AS BIGINT) AS ca,
        |    CAST(sum(1 - ina) AS BIGINT) AS cb
        |  FROM e GROUP BY event_type, cents),
        |w AS (SELECT event_type, ca, cb,
        |    sum(ca) OVER (PARTITION BY event_type) AS na,
        |    sum(cb) OVER (PARTITION BY event_type) AS nb,
        |    sum(ca) OVER (PARTITION BY event_type ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
        |    sum(cb) OVER (PARTITION BY event_type ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
        |  FROM cell)
        |SELECT event_type, CAST(max(na) AS BIGINT) AS n_a,
        |  CAST(max(nb) AS BIGINT) AS n_b,
        |  CAST(max(abs(cuma * 10000 // na - cumb * 10000 // nb)) AS BIGINT)
        |    AS ks_bp
        |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q183_target_encode" ->
      """WITH e AS (SELECT user_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |per AS (SELECT user_id, count(*) AS n,
        |    CAST(sum(cents) AS BIGINT) AS sum_cents FROM e GROUP BY user_id),
        |t AS (SELECT CAST(sum(cents) AS BIGINT) AS g_cents,
        |    count(*) AS g_n FROM e)
        |SELECT user_id, n, sum_cents,
        |  CAST(g_cents // g_n AS BIGINT) AS prior_cents,
        |  CAST((sum_cents + 20 * (g_cents // g_n)) * 1000 // (n + 20)
        |    AS BIGINT) AS enc_milli
        |FROM per, t ORDER BY user_id""".stripMargin,
    "q154_basket_lift" ->
      """WITH ut AS (
        |  SELECT user_id, event_type FROM events
        |  GROUP BY 1, 2 HAVING count(*) >= 12),
        |n AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
        |t AS (SELECT event_type, count(*) AS n_t FROM ut GROUP BY 1),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS n_ab
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, CAST(p.n_ab AS BIGINT) AS n_ab,
        |  CAST((p.n_ab * 1000000 // ta.n_t) * n.n_users // tb.n_t AS BIGINT)
        |    AS lift_micro
        |FROM p, n
        |JOIN t ta ON ta.event_type = p.type_a
        |JOIN t tb ON tb.event_type = p.type_b
        |ORDER BY type_a, type_b""".stripMargin,
    "q153_day_streaks" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
        |  FROM events),
        |i AS (SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS island
        |  FROM d),
        |s AS (SELECT user_id, island, count(*) AS streak FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(streak) AS BIGINT) AS n_days,
        |  CAST(max(streak) AS BIGINT) AS max_streak
        |FROM s GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q176_event_rollup" ->
      """WITH e AS (SELECT event_type,
        |    CAST(isodow(ts) AS BIGINT) AS wday,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events)
        |SELECT event_type, wday, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents,
        |  CAST(grouping(event_type) AS BIGINT) AS g_type,
        |  CAST(grouping(wday) AS BIGINT) AS g_wday
        |FROM e
        |GROUP BY GROUPING SETS ((event_type), (wday), ())
        |ORDER BY g_type, g_wday,
        |  event_type ASC NULLS FIRST, wday ASC NULLS FIRST""".stripMargin,
    "q174_value_ecdf" ->
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |r AS (SELECT event_id, event_type, cents,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY cents ASC, event_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM e)
        |SELECT event_id, event_type, cents,
        |  CAST(rn * 10000 // n AS BIGINT) AS pct_bp
        |FROM r ORDER BY event_id""".stripMargin,
    "q173_event_pivot" ->
      ("SELECT event_type,\n" +
        (1 to 7).map(d =>
          s"  CAST(sum(CASE WHEN isodow(ts) = $d THEN " +
            s"CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS d$d")
          .mkString(",\n") +
        "\nFROM events GROUP BY event_type ORDER BY event_type"),
    "q149_chi_square" ->
      """WITH c AS (
        |  SELECT event_type, (((date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7) + 7) % 7 AS dow,
        |    count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, dow, o,
        |    sum(o) OVER (PARTITION BY event_type) AS rt,
        |    sum(o) OVER (PARTITION BY dow) AS ct,
        |    sum(o) OVER () AS n
        |  FROM c),
        |cell AS (SELECT event_type, dow, o, rt, ct, n,
        |    CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE) AS e
        |  FROM t)
        |SELECT event_type, CAST(sum(o) AS BIGINT) AS n_type,
        |  CAST(sum(CAST(round((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e)
        |    / e * 1000000) AS BIGINT)) AS BIGINT) AS chi2_micro
        |FROM cell GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q146_interval_overlap" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ts
        |  FROM events),
        |s AS (SELECT user_id, ts,
        |    sum(CASE WHEN prev_ts IS NULL
        |          OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM e),
        |sess AS (SELECT user_id, session_seq,
        |    epoch_us(min(ts)) AS s0, epoch_us(max(ts)) AS s1
        |  FROM s GROUP BY 1, 2),
        |base AS (SELECT min(epoch_us(ts)) AS b FROM events),
        |camp AS (SELECT i AS campaign_id,
        |    b + i * 21600000000
        |      + CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 12))
        |             AS BIGINT) % 10800000000 AS c0
        |  FROM range(40) t(i), base),
        |camp2 AS (SELECT campaign_id, c0,
        |    c0 + 7200000000
        |      + CAST(('0x' || substr(md5(CAST(campaign_id AS VARCHAR)), 13, 12))
        |             AS BIGINT) % 14400000000 AS c1
        |  FROM camp)
        |SELECT campaign_id, count(*) AS n_sessions,
        |  CAST(sum(least(s1, c1) - greatest(s0, c0)) AS BIGINT) AS overlap_us
        |FROM sess JOIN camp2 ON s0 <= c1 AND c0 <= s1
        |GROUP BY 1 ORDER BY campaign_id""".stripMargin,
    "q144_resample_locf" ->
      """WITH p AS (
        |  SELECT user_id, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         row_number() OVER (
        |           PARTITION BY user_id, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |           ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events WHERE event_type = 'purchase' AND user_id % 3 = 0),
        |d AS (SELECT user_id, day, cents FROM p WHERE rn = 1),
        |g AS (SELECT user_id, unnest(range(min(day), max(day) + 1)) AS day
        |      FROM d GROUP BY user_id),
        |j AS (SELECT g.user_id, g.day, d.cents
        |      FROM g LEFT JOIN d USING (user_id, day))
        |SELECT user_id, day, last_value(cents IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents
        |FROM j ORDER BY user_id, day""".stripMargin,
    "q142_correlation" ->
      """WITH m AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM (SELECT event_type,
        |      ((epoch_us(ts) % 86400000000 + 86400000000)
        |        % 86400000000) // 1000000 AS x,
        |      CAST(round(value * 100) AS BIGINT) AS y
        |    FROM events) GROUP BY 1),
        |v AS (SELECT event_type, n,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num
        |  FROM m WHERE n > 1)
        |SELECT event_type, n, round(num / (sqrt(vx) * sqrt(vy)), 4) AS r
        |FROM v WHERE vx > 0 AND vy > 0 ORDER BY event_type""".stripMargin,
    "q140_topk_events" ->
      """WITH r AS (SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS rn
        |  FROM events WHERE event_type = 'purchase')
        |SELECT user_id, event_id,
        |  CAST(round(value * 100) AS BIGINT) AS cents
        |FROM r WHERE rn <= 2 ORDER BY user_id, event_id""".stripMargin,
    "q138_dau_wau" ->
      """WITH p AS (SELECT DISTINCT
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    user_id
        |  FROM events),
        |d AS (SELECT day, count(DISTINCT user_id) AS dau FROM p GROUP BY 1),
        |w AS (SELECT rday, count(DISTINCT user_id) AS wau FROM (
        |    SELECT unnest(generate_series(day, day + 6)) AS rday, user_id
        |    FROM p) GROUP BY 1)
        |SELECT CAST(d.day AS BIGINT) AS day, d.dau,
        |  w.wau, CAST((d.dau * 10000) // w.wau AS BIGINT) AS stickiness_bp
        |FROM d JOIN w ON d.day = w.rday ORDER BY day""".stripMargin,
    "q137_window_distinct" ->
      """SELECT user_id, event_id,
        |  count(DISTINCT event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS n_types_seen
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q136_robust_stats" ->
      """WITH c AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |q AS (SELECT event_type,
        |    percentile_cont(0.05) WITHIN GROUP (ORDER BY cents) AS p05,
        |    percentile_cont(0.5) WITHIN GROUP (ORDER BY cents) AS p50,
        |    percentile_cont(0.95) WITHIN GROUP (ORDER BY cents) AS p95
        |  FROM c GROUP BY 1),
        |j AS (SELECT c.event_type,
        |    CAST(round(least(greatest(CAST(cents AS DOUBLE), p05), p95)
        |      * 1000) AS BIGINT) AS w_units,
        |    abs(CAST(cents AS DOUBLE) - p50) AS absdev, p50
        |  FROM c JOIN q USING (event_type))
        |SELECT event_type, count(*) AS n,
        |  round(min(p50), 4) AS median_cents,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY absdev), 4)
        |    AS mad_cents,
        |  round(CAST(sum(w_units) AS DOUBLE) / (count(*) * 1000), 4)
        |    AS wins_mean_cents
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q135_trend_slope" ->
      """WITH c AS (SELECT user_id, epoch_us(ts) AS at_us,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |b AS (SELECT user_id,
        |    (at_us - min(at_us) OVER (PARTITION BY user_id)) // 1000000 AS x,
        |    cents
        |  FROM c),
        |m AS (SELECT user_id, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(cents) AS BIGINT) AS sy,
        |    CAST(sum(x * cents) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM b GROUP BY 1)
        |SELECT user_id, n,
        |  round((CAST(n * sxy - sx * sy AS DOUBLE)
        |    / (n * sxx - sx * sx)) * 86400.0, 4) AS slope_cents_day
        |FROM m WHERE n * sxx - sx * sx > 0 ORDER BY user_id""".stripMargin,
    "q134_ab_test" ->
      """WITH r AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS rn
        |  FROM events),
        |u AS (SELECT user_id,
        |    max(CASE WHEN rn = 1 AND event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS converted,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 4) < '8000'
        |      THEN 'A' ELSE 'B' END AS arm
        |  FROM r GROUP BY user_id),
        |s AS (SELECT
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN arm = 'A' THEN converted ELSE 0 END) AS BIGINT)
        |      AS x_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN arm = 'B' THEN converted ELSE 0 END) AS BIGINT)
        |      AS x_b
        |  FROM u)
        |SELECT n_a, x_a, n_b, x_b,
        |  round((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b) /
        |    sqrt(((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
        |        * (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)))
        |      * (1.0 / n_a + 1.0 / n_b)), 4) AS z
        |FROM s WHERE n_a > 0 AND n_b > 0 AND x_a + x_b > 0
        |  AND x_a + x_b < n_a + n_b""".stripMargin,
    "q132_value_histogram" ->
      """WITH b AS (SELECT event_type,
        |    CAST(least(greatest(floor(value / 50.0), 0.0), 9.0) AS BIGINT)
        |      AS bucket
        |  FROM events),
        |g AS (SELECT event_type, bucket, count(*) AS n
        |  FROM b GROUP BY 1, 2)
        |SELECT event_type, bucket, n,
        |  CAST((n * 10000) // sum(n) OVER (PARTITION BY event_type)
        |    AS BIGINT) AS share_bp
        |FROM g ORDER BY event_type, bucket""".stripMargin,
    "q133_rolling_zscore" ->
      """WITH c AS (SELECT user_id, event_id, ts,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |m AS (SELECT user_id, event_id, cents,
        |    count(*) OVER w AS n, sum(cents) OVER w AS s1,
        |    sum(cents * cents) OVER w AS s2
        |  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |z AS (SELECT user_id, event_id, cents,
        |    round((cents * n - s1) / sqrt(n * s2 - s1 * s1), 4) AS z
        |  FROM m WHERE n = 20 AND n * s2 - s1 * s1 > 0)
        |SELECT user_id, event_id, cents, z FROM z WHERE abs(z) > 2.5
        |ORDER BY user_id, event_id""".stripMargin,
    "q131_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, event_type, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ts
        |  FROM events),
        |s AS (SELECT user_id, event_type, ts,
        |    sum(CASE WHEN prev_ts IS NULL
        |          OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM e)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  count(*) AS n_events,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_purchases,
        |  epoch_us(min(ts)) AS start_us,
        |  CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS dur_us
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_seq""".stripMargin,
    "q129_interval_join" ->
      """WITH iv AS (
        |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS valid_from,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS valid_to
        |  FROM events WHERE event_type = 'purchase'),
        |pt AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS at_us
        |  FROM events WHERE event_type IN ('click', 'view', 'error'))
        |SELECT p.user_id, p.event_id, p.event_type, i.purchase_id,
        |  CAST(p.at_us - i.valid_from AS BIGINT) AS since_us
        |FROM pt p JOIN iv i ON p.user_id = i.user_id
        |  AND p.at_us >= i.valid_from AND p.at_us < i.valid_to
        |ORDER BY p.user_id, p.event_id""".stripMargin,
    "q127_window_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
        |       FROM events e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > s1.t1
        |         AND e.ts <= s1.t1 + INTERVAL 7 DAY GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3
        |       FROM events e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |         AND e.ts <= s2.t1 + INTERVAL 7 DAY GROUP BY e.user_id)
        |SELECT s1.user_id % 4 AS cohort, count(*) AS n_step1,
        |  count(s2.t2) AS n_step2, count(s3.t3) AS n_step3
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |GROUP BY 1 ORDER BY cohort""".stripMargin,
    "q118_pii_redact" ->
      raw"""WITH s AS (
        |  SELECT event_id,
        |    'evt ' || event_type || ' u' || CAST(user_id AS VARCHAR) ||
        |    '@Mail.Example.com' ||
        |    CASE WHEN event_id % 3 <> 0
        |      THEN ' call +1 (555) 123-' || lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0')
        |      ELSE ' no phone' END ||
        |    CASE WHEN user_id % 3 = 0
        |      THEN ' ssn 123-45-' || lpad(CAST(user_id % 10000 AS VARCHAR), 4, '0')
        |      ELSE '' END ||
        |    CASE WHEN event_id % 7 < 2
        |      THEN ' card 4111 1111 1111 ' || lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0')
        |      ELSE '' END ||
        |    CASE WHEN user_id % 2 = 0
        |      THEN ' cc Admin' || CAST(user_id % 7 AS VARCHAR) || '@corp.example.org'
        |      ELSE '' END ||
        |    CASE WHEN event_id % 5 < 3
        |      THEN ' from 10.' || CAST(user_id % 256 AS VARCHAR) || '.' ||
        |           CAST(event_id % 256 AS VARCHAR) || '.9'
        |      ELSE ' offline' END AS synth
        |  FROM events),
        |r AS (
        |  SELECT event_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(synth,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |      '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IP]', 'g'),
        |      '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
        |      '\b(?:\d{4}[ -]){3}\d{4}\b|\b\d{13,16}\b', '[CARD]', 'g'),
        |      '(^|[^0-9])((?:\+?\d{1,2}[ .-]?)?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b)', '\1[PHONE]', 'g')
        |      AS redacted
        |  FROM s)
        |SELECT event_id,
        |  CAST(len(regexp_extract_all(redacted,
        |    '\[(EMAIL|IP|SSN|CARD|PHONE)\]')) AS BIGINT) AS n_pii,
        |  redacted
        |FROM r ORDER BY event_id""".stripMargin,
    "q119_event_funnel" ->
      """WITH s AS (SELECT user_id, min(ts) AS first_signup FROM events
        |           WHERE event_type = 'signup' GROUP BY user_id),
        |c AS (SELECT DISTINCT s.user_id FROM s JOIN events e
        |      ON e.user_id = s.user_id AND e.event_type = 'purchase'
        |      AND e.ts >= s.first_signup
        |      AND e.ts <= s.first_signup + INTERVAL 3 DAY)
        |SELECT s.user_id % 8 AS cohort, count(*) AS n_signed,
        |  count(c.user_id) AS n_converted,
        |  CAST(count(c.user_id) * 10000 // count(*) AS BIGINT) AS conv_bp
        |FROM s LEFT JOIN c ON s.user_id = c.user_id
        |GROUP BY 1 ORDER BY cohort""".stripMargin,
    "q120_cohort_retention" ->
      """WITH w AS (SELECT user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        |  FROM events WHERE event_type = 'purchase'
        |    AND CAST(round(value * 100) AS BIGINT) > 15000),
        |f AS (SELECT user_id, min(d) AS cohort_day FROM w GROUP BY user_id)
        |SELECT f.cohort_day, w.d - f.cohort_day AS k,
        |  count(DISTINCT w.user_id) AS n_users
        |FROM w JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_day, k""".stripMargin,
    "q126_attribution" ->
      """WITH e AS (SELECT user_id, event_id, ts, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_type,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN ts END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_ts
        |  FROM events)
        |SELECT CASE WHEN prev_ts IS NOT NULL AND prev_ts >= ts - INTERVAL 1 DAY
        |            THEN prev_type ELSE 'none' END AS touch,
        |  count(*) AS n_purchases,
        |  CAST(sum(cents) AS BIGINT) AS revenue_cents
        |FROM e WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY touch""".stripMargin,
    "q124_time_weighted_avg" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |      - epoch_us(ts) AS dt_us
        |  FROM events)
        |SELECT user_id, count(*) AS n_intervals,
        |  CAST(sum(dt_us) AS BIGINT) AS span_us,
        |  CAST(CAST(sum(cents * dt_us) AS BIGINT)
        |    // CAST(sum(dt_us) AS BIGINT) AS BIGINT) AS twa_cents
        |FROM e WHERE dt_us IS NOT NULL
        |GROUP BY user_id HAVING sum(dt_us) > 0
        |ORDER BY user_id""".stripMargin,
    "q122_user_rfm" ->
      """WITH ref AS (SELECT max(CAST(ts AS DATE)) AS ref_day FROM events),
        |u AS (SELECT user_id, max(CAST(ts AS DATE)) AS last_day,
        |  count(*) AS f,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS m_cents
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |  CAST(date_diff('day', last_day, (SELECT ref_day FROM ref)) AS BIGINT)
        |    AS r_days,
        |  f, m_cents,
        |  CASE WHEN date_diff('day', last_day, (SELECT ref_day FROM ref)) <= 0
        |         AND f >= 67 THEN 'core'
        |       WHEN date_diff('day', last_day, (SELECT ref_day FROM ref)) <= 0
        |         THEN 'active'
        |       WHEN f >= 67 THEN 'whale'
        |       ELSE 'casual' END AS segment
        |FROM u ORDER BY user_id""".stripMargin,
    "q123_scd2_intervals" ->
      """WITH c AS (SELECT user_id, event_type AS status, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev
        |  FROM events),
        |ch AS (SELECT user_id, status, ts, event_id FROM c
        |       WHERE prev IS NULL OR prev <> status)
        |SELECT user_id, status, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS valid_to,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS BIGINT) AS version
        |FROM ch ORDER BY user_id, version""".stripMargin,
    "q121_event_transitions" ->
      """WITH o AS (SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS next_type
        |  FROM events)
        |SELECT event_type, next_type, count(*) AS n_pairs FROM o
        |WHERE next_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY event_type, next_type""".stripMargin,
  )
}

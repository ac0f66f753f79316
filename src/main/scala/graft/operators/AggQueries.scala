package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.2.C — aggregation (SoQL `$group`/`$having` + aggregate functions).
  *
  * All bodies are plain `groupBy(...).agg(...)` so Spark plans a partial
  * (map-side) HashAggregate before the shuffle and a final one after — the
  * shape that scales: only |groups| rows cross the wire, not |input|.
  * rollup/cube lower to a single Expand + HashAggregate, not N passes.
  */
object AggQueries {

  /** Flagship — TPC-H Q1 shape (SURVEY.md §2.2 q20).
    *
    * Money sums follow the money-sum rule (Det.scala): exact decimal
    * accumulation, order-independent by construction. Precision audit
    * (ADVICE r10 wording fix): disc/tax cast to decimal(3,2), so the
    * (1±x) factors are decimal(4,2) SUBTRACTION/ADDITION RESULTS; price
    * decimal(12,2) × decimal(4,2) factors → decimal(22,6) products,
    * summed at decimal(32,6) — no overflow, no precision cap. `sum_qty` stays a double sum because l_quantity is
    * INTEGRAL (1–50, FIXTURES.md:88): every partial sum is an exact
    * integer far below 2^53, so the double sum is exact at any
    * accumulation order. The averages divide an exact numerator (integer
    * double sum, or exact decimal sum cast once to double) by the group
    * count in one double division — no accumulation order survives.
    * The oracle mirrors every cast.
    */
  def q20_agg_hash(spark: SparkSession, sfDir: String): DataFrame = {
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val discF = lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")
    val taxF  = lit(1).cast("decimal(3,2)") + col("l_tax").cast("decimal(3,2)")
    val n = count(lit(1))
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.r2(sum(col("l_quantity"))).as("sum_qty"),
        Det.r2(sum(price).cast("double")).as("sum_base_price"),
        Det.r2(sum(price * discF).cast("double")).as("sum_disc_price"),
        Det.r2(sum(price * discF * taxF).cast("double")).as("sum_charge"),
        Det.r2(sum(col("l_quantity")) / n).as("avg_qty"),
        Det.r2(sum(price).cast("double") / n).as("avg_price"),
        Det.r2(sum(col("l_discount").cast("decimal(3,2)")).cast("double") / n)
          .as("avg_disc"),
        n.as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  def q21_agg_distinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))

  def q22_agg_rollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.nation(spark, sfDir),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir),
        col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        grouping_id().cast("int").as("gid"),
        Det.r2(Det.sumMoney(col("c_acctbal"))).as("sum_bal"),
        count(lit(1)).as("n"))
      .orderBy(col("gid"), col("r_name").asc_nulls_first,
        col("n_name").asc_nulls_first)

  def q23_agg_cube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n"),
        Det.r2(Det.sumMoney(col("o_totalprice"))).as("sum_price"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  def q25_agg_having(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(12,2)")).as("total_raw"))
      .filter(col("n") >= 3 && col("total_raw") > 150000)
      .select(col("o_custkey"), col("n"),
        Det.r2(col("total_raw").cast("double")).as("total"))
      .orderBy(col("o_custkey"))

  /** Exact interpolated percentiles (SoQL/`Enumerable` stats surface):
    * DuckDB's `percentile_cont` and the histogram + crossing-rule rewrite
    * share the linear-interpolation-at-rank definition; 4-dp rounding
    * absorbs ulp drift.
    *
    * NOT `percentile()`: that aggregate's ObjectAggregation buffer holds
    * every distinct value of a group in one in-memory map on one executor
    * — an OOM at 100 TB with alphabet-bounded groups. The rewrite
    * ([[graft.functions.ExactPercentile]]) builds a spillable two-phase
    * (event_type, value) count histogram and runs the rank selection over
    * the bounded histogram, reproducing `Percentile`'s interpolation
    * doubles bit-for-bit (same IEEE ops, same order → same hashes).
    */
  def q27_agg_percentile(spark: SparkSession, sfDir: String): DataFrame =
    graft.functions.ExactPercentile.of(
        Tables.events(spark, sfDir).select(col("event_type"), col("value")),
        Seq("event_type"), "value",
        Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99"))
      .select(col("event_type"), Det.r4(col("p50")).as("p50"),
        Det.r4(col("p90")).as("p90"), Det.r4(col("p99")).as("p99"))
      .orderBy(col("event_type"))

  /** max_by/min_by with an explicit lexicographic (value, id) tie-break —
    * bare max_by on a double key is nondeterministic under ties.
    */
  def q28_agg_minmax_by(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        expr("max_by(event_id, struct(value, event_id))").as("id_of_max"),
        expr("min_by(event_id, struct(value, event_id))").as("id_of_min"),
        Det.r4(max(col("value"))).as("max_v"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** boolean aggregates (SoQL checkbox-column rollups) */
  def q29_agg_bool(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .groupBy(col("c_mktsegment"))
      .agg(
        bool_and(col("c_acctbal") > 0).as("all_pos"),
        bool_or(col("c_acctbal") < 0).as("any_neg"),
        count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))

  def q26_agg_stats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        Det.r4(stddev_samp(col("value"))).as("sd"),
        Det.r4(avg(col("value"))).as("mean"),
        Det.r4(min(col("value"))).as("min_v"),
        Det.r4(max(col("value"))).as("max_v"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Dataset profiling (round 4): per-column row/null/distinct counts and
    * min/max over five lineitem measures — the catalog-metadata surface a
    * user points at an unknown table first.
    *
    * Scale shape: ONE scan computes all 5×4 aggregates in a single
    * two-phase HashAggregate pass (exact countDistinct lowers to Expand —
    * still one source scan), then a `stack` unpivots the 1-row result to
    * the per-column report. Profiling 100 TB costs one pass, not one pass
    * per column.
    */
  def q76_profile_stats(spark: SparkSession, sfDir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_discount", "l_tax", "l_extendedprice",
      "l_orderkey")
    // unpivot FIRST (stack to (col_name, v)), aggregate once: with a single
    // DISTINCT column Spark plans a plain two-phase distinct aggregate —
    // partial distinct collapses (col_name, v) per partition before the
    // exchange. The previous form (5 countDistincts in one agg) planned an
    // Expand that shipped 6x the table through the shuffle; the double
    // cast is injective for every profiled column (ints < 2^53, decimals
    // with exact double forms), so n_distinct/min/max are unchanged.
    val stackArgs = cols.map(c => s"'$c', CAST($c AS DOUBLE)").mkString(", ")
    Tables.lineitem(spark, sfDir)
      .selectExpr(s"stack(${cols.size}, $stackArgs) AS (col_name, v)")
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("v"))).as("n_null"),
        countDistinct(col("v")).as("n_distinct"),
        Det.r2(min(col("v"))).as("min_v"),
        Det.r2(max(col("v"))).as("max_v"))
      .orderBy(col("col_name"))
  }

  /** GROUPING SETS — the general form rollup/cube specialize (round 3).
    * Expressed through `spark.sql` over a temp view: Spark lowers it to the
    * same single Expand + HashAggregate as rollup/cube (no N passes).
    * `grouping(col)` flags disambiguate the NULL-as-total rows; NULLS FIRST
    * is pinned explicitly because Spark and DuckDB default differently.
    */
  def q24_agg_grouping_sets(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("graft_orders_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total,
        |  cast(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  cast(grouping(o_orderpriority) AS BIGINT) AS g_prio
        |FROM graft_orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio,
        |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        |""".stripMargin)
  }

  /** Pivot (round 3): priority classes to columns, one row per status —
    * lowered by Spark to a single agg with conditional sums (the same
    * CASE-WHEN shape the oracle spells out), NOT per-column passes.
    */
  def q45_pivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(Det.r2(Det.sumMoney(col("o_totalprice"))))
      .orderBy(col("o_orderstatus"))

  /** Ordered string aggregation (round 3): LISTAGG/string_agg semantics
    * made deterministic by sorting the collected values before joining —
    * `collect_list` order is partition-dependent, so the sort is the
    * correctness step, not a style choice.
    */
  def q48_string_agg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.nation(spark, sfDir)
      .join(broadcast(Tables.region(spark, sfDir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
        count(lit(1)).as("n"))
      .orderBy(col("r_name"))

  private def profileSub(c: String): String =
    s"""SELECT '$c' AS col_name, count(*) AS n_rows,
       |  count(*) - count($c) AS n_null,
       |  count(DISTINCT $c) AS n_distinct,
       |  round(CAST(min($c) AS DOUBLE), 2) AS min_v,
       |  round(CAST(max($c) AS DOUBLE), 2) AS max_v FROM lineitem""".stripMargin

  /** Pareto / ABC analysis (q147): per supplier nation, how many parts
    * cover 80% of revenue — the cumulative-share threshold selection
    * behind inventory ABC classes, "head vs tail" corpus curation cuts,
    * and top-sellers dashboards. Revenue quantized to integer cents
    * per ROW (one double product, same literal order both engines), then
    * everything downstream is exact integer arithmetic — the 80% test is
    * `cum_before × 5 < total × 4`, no float division anywhere. Ordering
    * (cents desc, partkey) is a total order per nation, so the running
    * sum is layout-independent. Shape: one broadcast dim join + one
    * (nation, part) agg + windows over that agg's bounded output (rows
    * per nation ≤ |part|); the final rollup is 25 rows.
    */
  def q147_pareto(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select(col("l_suppkey"),
      col("l_partkey"),
      round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long").as("cents"))
    val sup = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey").cast("long").as("nation"))
    val pp = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), col("l_partkey"))
      .agg(sum(col("cents")).as("cents"))
    val wOrd = Window.partitionBy(col("nation"))
      .orderBy(col("cents").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col("nation"))
    pp.withColumn("cum_before",
        coalesce(sum(col("cents")).over(wOrd), lit(0L)))
      .withColumn("total", sum(col("cents")).over(wTot))
      .withColumn("is_top", col("cum_before") * 5 < col("total") * 4)
      .groupBy(col("nation"))
      .agg(count(lit(1)).as("n_parts"),
        sum(when(col("is_top"), 1L).otherwise(0L)).as("n_top"))
      .select(col("nation"), col("n_parts"), col("n_top"),
        expr("n_top * 10000 div n_parts").as("top_bp"))
      .orderBy(col("nation"))
  }

  /** Weighted median (q152): the quantity-weighted median line price per
    * supplier nation — the weighted-quantile family (q27/q136 are the
    * unweighted tier). Lower weighted median: the smallest value whose
    * cumulative weight reaches half the total. All integer arithmetic
    * (cents, integral quantities — cast parity holds because every
    * l_quantity is exactly integral; the 2·cumw ≥ totw test needs no
    * division). Tied values are safe by construction: rows sharing a
    * cents value may order arbitrarily among themselves, but the
    * SELECTED value is the tie block's shared value wherever the
    * crossing lands inside it, so the output is layout-independent.
    * Shape: broadcast dim join + one per-nation window + one rollup —
    * window input is lineitem-sized but partitioned on nation (AQE
    * skew-splittable ordering sort, bounded state). Emit (nation,
    * wmedian_cents, tot_qty); order by nation.
    */
  def q152_weighted_median(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select(col("l_suppkey"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"),
      col("l_quantity").cast("long").as("w"))
    val sup = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey").cast("long").as("nation"))
    val wCum = Window.partitionBy(col("nation")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("nation"))
    li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .withColumn("cumw", sum(col("w")).over(wCum))
      .withColumn("totw", sum(col("w")).over(wTot))
      .filter(col("cumw") * 2 >= col("totw"))
      .groupBy(col("nation"))
      .agg(min(col("cents")).as("wmedian_cents"),
        min(col("totw")).as("tot_qty"))
      .orderBy(col("nation"))
  }

  /** UNPIVOT / melt (q190): the wide→long inverse of q45/q173's pivot,
    * declared as its own operator — four per-line measures (quantity,
    * extended-price cents, discount bp, tax bp) stack into (metric, val)
    * rows in ONE scan (Spark lowers `unpivot` to a single Expand — the
    * q23/q76 shape; the oracle replays it as 4 UNION ALL scans, same
    * rows), then a per-metric summary. The melt step is what feeds
    * long-format stores and per-metric monitors from wide fact tables.
    *
    * Exactness: every measure is quantized to integers per row before
    * the stack (round-then-cast on both engines — double cast rounding
    * differs between them, rounding first is exact on integral values).
    *
    * Scale shape: Expand multiplies rows by 4 map-side, absorbed by the
    * partial agg in the same stage; the shuffle is |metrics| rows.
    */
  def q190_unpivot(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select(
      round(col("l_quantity")).cast("long").as("quantity"),
      round(col("l_extendedprice") * 100).cast("long").as("extprice_cents"),
      round(col("l_discount") * 10000).cast("long").as("discount_bp"),
      round(col("l_tax") * 10000).cast("long").as("tax_bp"))
    li.unpivot(Array.empty[org.apache.spark.sql.Column],
        Array(col("quantity"), col("extprice_cents"), col("discount_bp"),
          col("tax_bp")), "metric", "val")
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n"), sum(col("val")).as("total"),
        min(col("val")).as("vmin"), max(col("val")).as("vmax"))
      .orderBy(col("metric"))
  }

  /** Month-over-month revenue growth (q199): monthly order totals with
    * the growth rate in basis points — the canonical period-over-period
    * reporting shape (q168 is within-week seasonality on the event log;
    * this is the calendar trend on the order book). Growth uses the
    * shift identity cents·10⁴ div prev − 10⁴ ≡ (cents−prev)·10⁴/prev so
    * the division only ever sees a NON-NEGATIVE numerator, where the
    * truncation both engines apply (Spark DIV and DuckDB // alike) IS
    * floor — a shrinking month through a bare negative division would
    * round toward zero instead. First month emits NULL (no prior period), nullif-guarded.
    *
    * Scale shape: one two-phase (month) agg collapses the order book;
    * the lag window runs over the calendar-bounded month frame (the
    * q150/q171 single-task bound).
    */
  def q199_mom_growth(spark: SparkSession, sfDir: String): DataFrame = {
    val m = Tables.orders(spark, sfDir)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
    m.withColumn("prev", lag(col("cents"), 1).over(Window.orderBy(col("month"))))
      .select(col("month"), col("n_orders"), col("cents"),
        expr("cents * 10000 div nullif(prev, 0) - 10000").as("mom_bp"))
      .orderBy(col("month"))
  }

  /** Demand-variability (XYZ) classification (q204): per part, the
    * coefficient of variation of MONTHLY shipped quantity with the
    * X/Y/Z class (stable / variable / erratic at 60%/70% CV) — the
    * inventory-planning companion of q147's value-based ABC classes
    * (forecastable A-parts get different stocking policy than erratic
    * ones; the ABC×XYZ matrix is the standard planning grid).
    *
    * Exactness: monthly sums and both moments are exact BIGINTs
    * (per-row round of the integral-valued quantity); CV =
    * √(n·Σq²−S²)/S evaluated in ONE literal order and rounded once to
    * bp — the numerator is ≥ 0 (Cauchy–Schwarz) and S > 0 (quantities
    * positive), so there is no sign divergence. Same moment discipline
    * as q133/q135/q142.
    *
    * Scale shape: two chained two-phase aggs on the part key — the
    * fact table collapses at (part, month) grain map-side; nothing
    * after the first agg exceeds |parts|×|months|.
    */
  def q204_demand_variability(spark: SparkSession,
                              sfDir: String): DataFrame = {
    val m = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"),
        date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        round(col("l_quantity")).cast("long").as("qty"))
      .groupBy(col("l_partkey"), col("month"))
      .agg(sum(col("qty")).as("q"))
    m.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_months"), sum(col("q")).as("total_qty"),
        sum(col("q") * col("q")).as("q2"))
      .withColumn("cv_bp",
        round(sqrt((col("n_months") * col("q2") -
          col("total_qty") * col("total_qty")).cast("double"))
          / col("total_qty") * 10000).cast("long"))
      .select(col("l_partkey"), col("n_months"), col("total_qty"),
        col("cv_bp"),
        when(col("cv_bp") < 6000, "X").when(col("cv_bp") < 7000, "Y")
          .otherwise("Z").as("xyz"))
      .orderBy(col("l_partkey"))
  }

  /** Shipping-delay SLA percentiles (q219): per order priority, exact
    * p50/p90/p99 and max of line-level ship delay (l_shipdate −
    * o_orderdate in days) — the logistics SLA report ("do URGENT orders
    * actually ship faster, and what does the tail look like?"); the
    * latency-percentile dashboard shape on the warehouse schema.
    * Complements q187 (amount reconciliation) and q208 (outstanding
    * age) with fulfilment SPEED.
    *
    * Exactness: delays are exact integer day differences; percentiles
    * via the integer crossing rule on the (priority, delay) histogram
    * (cum·2 ≥ n / cum·10 ≥ n·9 / cum·100 ≥ n·99 — the q166/q221
    * lower-percentile convention, no interpolation, no float).
    *
    * Scale shape: the orders⋈lineitem join runs on the natural
    * o_orderkey partitioning (exchange-free on co-bucketed layouts),
    * then the fact collapses into a (priority, delay) two-phase
    * histogram — the crossing window reads |priorities|×|delay alphabet|
    * rows, never the fact (the ExactPercentile argument).
    */
  def q219_ship_delay(spark: SparkSession, sfDir: String): DataFrame = {
    // CALENDAR day difference (both operands truncated to dates), matching
    // the oracle's date_diff('day', …) exactly: the previous floor of the
    // instant difference in µs agreed only for midnight-aligned timestamps
    // (true of the TPC-H-style fixtures — hashes unchanged) and would
    // diverge if the date columns ever carried time-of-day
    val hist = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          to_date(col("o_orderdate")).as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("sd"), col("od")).cast("long").as("delay"))
      .groupBy(col("o_orderpriority"), col("delay"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("delay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n",
        sum(col("c")).over(Window.partitionBy(col("o_orderpriority"))))
      .groupBy(col("o_orderpriority"))
      .agg(max(col("n")).as("n_lines"),
        min(when(col("cum") * 2 >= col("n"), col("delay"))).as("p50_d"),
        min(when(col("cum") * 10 >= col("n") * 9, col("delay")))
          .as("p90_d"),
        min(when(col("cum") * 100 >= col("n") * 99, col("delay")))
          .as("p99_d"),
        max(col("delay")).as("max_d"))
      .orderBy(col("o_orderpriority"))
  }

  /** Monthly revenue waterfall (q224): gross → −discount → +tax → net,
    * per ship month — the decomposition a finance review reads before
    * any single "revenue" number (a net trend can hide a discount creep
    * exactly offsetting volume growth; the waterfall shows which lever
    * moved). Completes the finance-reporting trio: q187 reconciles,
    * q199 trends, this DECOMPOSES.
    *
    * Exactness: each component (gross, discount amount, tax amount) is
    * rounded to cents PER ROW once (the q58/q187 float-boundary rule)
    * then summed as BIGINT — so net ≡ gross − discount + tax holds
    * exactly by construction, and the discount share floors once in bp.
    *
    * Scale shape: one scan → (month) two-phase conditional agg; the
    * month frame is calendar-bounded. No join — the waterfall needs
    * only lineitem columns.
    */
  def q224_margin_waterfall(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        round(col("l_extendedprice") * 100).cast("long").as("gross"),
        round(col("l_extendedprice") * col("l_discount") * 100)
          .cast("long").as("disc"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * col("l_tax") * 100).cast("long").as("tax"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_lines"), sum(col("gross")).as("gross_cents"),
        sum(col("disc")).as("discount_cents"),
        sum(col("tax")).as("tax_cents"))
      .select(col("month"), col("n_lines"), col("gross_cents"),
        col("discount_cents"), col("tax_cents"),
        (col("gross_cents") - col("discount_cents") + col("tax_cents"))
          .as("net_cents"),
        expr("discount_cents * 10000 div gross_cents").as("discount_bp"))
      .orderBy(col("month"))

  val oracle: Map[String, String] = Map(
    "q224_margin_waterfall" ->
      """WITH l AS (SELECT strftime(l_shipdate, '%Y-%m') AS month,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS gross,
        |    CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)
        |      AS disc,
        |    CAST(round(l_extendedprice * (1.0 - l_discount) * l_tax * 100)
        |      AS BIGINT) AS tax
        |  FROM lineitem),
        |g AS (SELECT month, count(*) AS n_lines,
        |    CAST(sum(gross) AS BIGINT) AS gross_cents,
        |    CAST(sum(disc) AS BIGINT) AS discount_cents,
        |    CAST(sum(tax) AS BIGINT) AS tax_cents
        |  FROM l GROUP BY month)
        |SELECT month, n_lines, gross_cents, discount_cents, tax_cents,
        |  gross_cents - discount_cents + tax_cents AS net_cents,
        |  CAST(discount_cents * 10000 // gross_cents AS BIGINT)
        |    AS discount_bp
        |FROM g ORDER BY month""".stripMargin,
    "q219_ship_delay" ->
      """WITH d AS (SELECT o.o_orderpriority,
        |    date_diff('day', o.o_orderdate, l.l_shipdate) AS delay
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |hist AS (SELECT o_orderpriority, delay, count(*) AS c
        |  FROM d GROUP BY 1, 2),
        |w AS (SELECT o_orderpriority, delay,
        |    sum(c) OVER (PARTITION BY o_orderpriority ORDER BY delay
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(c) OVER (PARTITION BY o_orderpriority) AS n FROM hist)
        |SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n_lines,
        |  min(CASE WHEN cum * 2 >= n THEN delay END) AS p50_d,
        |  min(CASE WHEN cum * 10 >= n * 9 THEN delay END) AS p90_d,
        |  min(CASE WHEN cum * 100 >= n * 99 THEN delay END) AS p99_d,
        |  max(delay) AS max_d
        |FROM w GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q204_demand_variability" ->
      """WITH m AS (SELECT l_partkey, strftime(l_shipdate, '%Y-%m') AS month,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem GROUP BY 1, 2),
        |p AS (SELECT l_partkey, count(*) AS n_months,
        |    CAST(sum(q) AS BIGINT) AS total_qty,
        |    CAST(sum(q * q) AS BIGINT) AS q2 FROM m GROUP BY 1),
        |c AS (SELECT l_partkey, n_months, total_qty,
        |    CAST(round(sqrt(CAST(n_months * q2 - total_qty * total_qty
        |      AS DOUBLE)) / total_qty * 10000) AS BIGINT) AS cv_bp
        |  FROM p)
        |SELECT l_partkey, n_months, total_qty, cv_bp,
        |  CASE WHEN cv_bp < 6000 THEN 'X' WHEN cv_bp < 7000 THEN 'Y'
        |    ELSE 'Z' END AS xyz
        |FROM c ORDER BY l_partkey""".stripMargin,
    "q199_mom_growth" ->
      """WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |    count(*) AS n_orders,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |w AS (SELECT month, n_orders, cents,
        |    lag(cents) OVER (ORDER BY month) AS prev FROM m)
        |SELECT month, n_orders, cents,
        |  CAST(cents * 10000 // nullif(prev, 0) - 10000 AS BIGINT) AS mom_bp
        |FROM w ORDER BY month""".stripMargin,
    "q190_unpivot" ->
      """WITH m AS (
        |  SELECT 'quantity' AS metric,
        |    CAST(round(l_quantity) AS BIGINT) AS val FROM lineitem
        |  UNION ALL SELECT 'extprice_cents',
        |    CAST(round(l_extendedprice * 100) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'discount_bp',
        |    CAST(round(l_discount * 10000) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'tax_bp',
        |    CAST(round(l_tax * 10000) AS BIGINT) FROM lineitem)
        |SELECT metric, count(*) AS n, CAST(sum(val) AS BIGINT) AS total,
        |  CAST(min(val) AS BIGINT) AS vmin, CAST(max(val) AS BIGINT) AS vmax
        |FROM m GROUP BY metric ORDER BY metric""".stripMargin,
    "q152_weighted_median" ->
      """WITH li AS (
        |  SELECT CAST(s.s_nationkey AS BIGINT) AS nation,
        |    CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents,
        |    CAST(l.l_quantity AS BIGINT) AS w
        |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey),
        |c AS (SELECT nation, cents, w,
        |    sum(w) OVER (PARTITION BY nation ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |    sum(w) OVER (PARTITION BY nation) AS totw
        |  FROM li)
        |SELECT nation, min(cents) AS wmedian_cents,
        |  CAST(min(totw) AS BIGINT) AS tot_qty
        |FROM c WHERE 2 * cumw >= totw GROUP BY 1 ORDER BY nation""".stripMargin,
    "q147_pareto" ->
      """WITH li AS (
        |  SELECT l.l_partkey, CAST(s.s_nationkey AS BIGINT) AS nation,
        |    CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100)
        |         AS BIGINT) AS cents
        |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey),
        |pp AS (SELECT nation, l_partkey, CAST(sum(cents) AS BIGINT) AS cents
        |       FROM li GROUP BY 1, 2),
        |w AS (SELECT nation, l_partkey, cents,
        |    coalesce(sum(cents) OVER (PARTITION BY nation
        |      ORDER BY cents DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before,
        |    sum(cents) OVER (PARTITION BY nation) AS total
        |  FROM pp)
        |SELECT nation, count(*) AS n_parts,
        |  CAST(sum(CASE WHEN cum_before * 5 < total * 4 THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_top,
        |  CAST(sum(CASE WHEN cum_before * 5 < total * 4 THEN 1 ELSE 0 END)
        |       * 10000 // count(*) AS BIGINT) AS top_bp
        |FROM w GROUP BY 1 ORDER BY nation""".stripMargin,
    "q76_profile_stats" ->
      (Seq("l_quantity", "l_discount", "l_tax", "l_extendedprice",
        "l_orderkey").map(profileSub).mkString("", "\nUNION ALL\n",
        "\nORDER BY col_name")),
    "q24_agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total,
        |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio,
        |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q45_pivot" ->
      """SELECT o_orderstatus,
        |  round(CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE), 2) AS "1-URGENT",
        |  round(CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE), 2) AS "2-HIGH",
        |  round(CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE), 2) AS "3-MEDIUM",
        |  round(CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE), 2) AS "4-NOT SPECIFIED",
        |  round(CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE), 2) AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q48_string_agg" ->
      """SELECT r_name,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  count(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q20_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_base_price,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 2) AS sum_disc_price,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) *
        |    (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE), 2) AS sum_charge,
        |  round(sum(l_quantity) / count(*), 2) AS avg_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 2) AS avg_price,
        |  round(CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / count(*), 2) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q21_agg_distinct" ->
      """SELECT c_mktsegment, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q22_agg_rollup" ->
      """SELECT r_name, n_name,
        |  CAST(GROUPING(r_name, n_name) AS INTEGER) AS gid,
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_bal,
        |  count(*) AS n
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY gid, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q23_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q25_agg_having" ->
      """SELECT o_custkey, count(*) AS n,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS total
        |FROM orders GROUP BY o_custkey
        |HAVING count(*) >= 3 AND sum(CAST(o_totalprice AS DECIMAL(12,2))) > 150000
        |ORDER BY o_custkey""".stripMargin,
    "q26_agg_stats" ->
      """SELECT event_type,
        |  round(stddev_samp(value), 4) AS sd,
        |  round(avg(value), 4) AS mean,
        |  round(min(value), 4) AS min_v,
        |  round(max(value), 4) AS max_v,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q29_agg_bool" ->
      """SELECT c_mktsegment,
        |  bool_and(c_acctbal > 0) AS all_pos,
        |  bool_or(c_acctbal < 0) AS any_neg,
        |  count(*) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q28_agg_minmax_by" ->
      """WITH mx AS (SELECT event_type, event_id AS id_of_max FROM (
        |    SELECT event_type, event_id, row_number() OVER (
        |      PARTITION BY event_type ORDER BY value DESC, event_id DESC) AS rn
        |    FROM events) WHERE rn = 1),
        |  mn AS (SELECT event_type, event_id AS id_of_min FROM (
        |    SELECT event_type, event_id, row_number() OVER (
        |      PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rn
        |    FROM events) WHERE rn = 1),
        |  st AS (SELECT event_type, round(max(value), 4) AS max_v,
        |    count(*) AS n FROM events GROUP BY 1)
        |SELECT st.event_type, mx.id_of_max, mn.id_of_min, st.max_v, st.n
        |FROM st JOIN mx USING (event_type) JOIN mn USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "q27_agg_percentile" ->
      """SELECT event_type,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 4) AS p50,
        |  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY value), 4) AS p90,
        |  round(percentile_cont(0.99) WITHIN GROUP (ORDER BY value), 4) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}

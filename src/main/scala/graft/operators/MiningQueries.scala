package graft.operators

import graft.{Det, Tables}
import graft.functions.Components
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pattern-mining / applied-analytics tier (round 5 cont. 5): the query
  * families a production analytics engine serves beyond plain OLAP —
  * collaborative-filtering item similarity, sequential path mining,
  * exponential smoothing, entity-resolution clustering, kNN
  * classification, spatial density stencils, funnel-latency percentiles,
  * and information-theoretic dependence. All hash-checked against the
  * DuckDB oracle like every other declared tier (SURVEY §2.2.M);
  * determinism discipline per §7.2 (integer/micro-unit arithmetic,
  * r6-rounded similarity surfaces, explicit tie-breaks, total order).
  */
object MiningQueries {

  /** q160: item-item co-occurrence similarity (the collaborative-filtering
    * "customers who bought X also bought Y" primitive) over order baskets.
    * Distinct (order, part) pairs co-occurring in an order; similarity =
    * cooc / √(freq_a·freq_b) (cosine on binary incidence vectors — exact
    * integers until the final rounded surface). Query items = parts with
    * key % 100 == 0; top-3 neighbors each by (sim desc, part id).
    *
    * Scale: the pair join is pruned to query-relevant pairs BEFORE the
    * aggregation (predicate inside the self-join), so cost is
    * |query items| × basket fanout, not all-pairs; baskets bound the
    * per-order explosion at (lines/order choose 2) ≈ 21. The full-matrix
    * variant at 100 TB is DIMSUM sampling territory — SHIPPED as
    * [[graft.functions.Dimsum.itemCosine]] (unit tier, DimsumSpec pins
    * recall/MSE vs this query's exact formula); the query-driven form IS
    * the production shape (real CF serving scores a candidate set, never
    * the n² matrix).
    */
  def q160_item_cooccur_sim(spark: SparkSession, sfDir: String): DataFrame = {
    // (order, part) incidence, deliberately NOT materialized: a
    // localCheckpoint here (round 5) serialized the full incidence before
    // any downstream work AND blocked the query-item predicate from
    // reaching the scan. Unmaterialized, Catalyst pushes `p % 100 = 0`
    // into the qa branch's parquet scan (1% of rows ever shuffle) and the
    // basket join builds its hash relation on that filtered side — both
    // pinned in PlanShapeSpec. Price: the 2-column scan+distinct is
    // re-derived per branch; at warehouse scale that's the cheaper side of
    // the trade (a real deployment materializes incidence as a bucketed
    // table — sources/Sources.writeBucketed — and pays the shuffle once).
    // explicit not-null filters (round 13, guide §2.4): the basket-join
    // branch pushes isnotnull(o) into its scan and the freq branches
    // isnotnull(p) into theirs, so the four subtrees reading this frame
    // were canonically UNEQUAL and not one exchange was reused — the
    // profile showed the scan+partial-distinct stage computed twice and
    // the freq aggregate twice (its broadcast too). Filtering both keys
    // here (a no-op on TPC-H lineitem, and inner joins drop null keys
    // anyway) makes every branch's subtree identical, so Spark reuses
    // the distinct exchange and the freq broadcast instead of
    // recomputing them. (A persist here is NOT the answer — measured
    // 1.0 → 1.55 s at sf0.1: columnar encode of 600k rows costs more
    // than the scans it saves, the round-5 localCheckpoint lesson.)
    val lp = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .filter(col("o").isNotNull && col("p").isNotNull)
      .distinct()
    val freq = lp.groupBy(col("p")).agg(count(lit(1)).as("f"))
    // query-item incidence is 1% of lp — joining IT against the baskets
    // yields every (query, neighbor) pair in both directions directly
    // (no a<b + symmetrize pass) and lets the query predicate prune
    // BEFORE the join: the corpus side never self-joins
    val qa = lp.filter(col("p") % 100 === 0)
      .select(col("o"), col("p").as("part_a"))
    val sym = qa.join(lp.select(col("o"), col("p").as("part_b")), "o")
      .filter(col("part_a") =!= col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("cooc"))
    val scored = sym
      .join(freq.select(col("p").as("part_a"), col("f").as("fa")), "part_a")
      .join(freq.select(col("p").as("part_b"), col("f").as("fb")), "part_b")
      .withColumn("sim", Det.r6(col("cooc").cast("double") /
        sqrt(col("fa").cast("double") * col("fb").cast("double"))))
    val w = Window.partitionBy(col("part_a"))
      .orderBy(col("sim").desc, col("part_b").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("part_a"), col("part_b"), col("cooc"), col("sim"), col("rank"))
      .orderBy(col("part_a"), col("rank"))
  }

  /** q161: top event-type trigram paths across 30-minute sessions — the
    * sequential-pattern / user-journey ("Sankey") mining primitive.
    * Sessions via [[Sessionize.assign]] (q131's operator); consecutive
    * event triples within a session by (ts, event_id) order; global top-10
    * paths by (count desc, path asc).
    *
    * Scale: two windows on one (user, session) partitioning, then an agg
    * whose key space is the event-type alphabet cubed (bounded); the final
    * top-10 window runs over ≤|alphabet|³ rows, never the log.
    */
  def q161_path_trigrams(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Sessionize.assign(Tables.events(spark, sfDir), Seq("user_id"),
      "ts", gap = "30 MINUTE", tieBreak = Seq("event_id"))
    val w = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ts"), col("event_id"))
    val paths = s
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
    val wTop = Window.orderBy(col("n").desc, col("path").asc)
    paths.withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= 10)
      .orderBy(col("rank"))
  }

  /** q162: exponentially weighted moving average (α = 1/2) of each user's
    * daily spend, EXACT in integers: daily sums in micro-units, the EWMA
    * numerator folded as Σ vᵢ·2^(k−1−lag) over the last ≤16 observed days
    * (newest weight 2^(k−1) — `aggregate(reverse(window list), acc·2+x)`,
    * a codegen-safe integer Horner scheme), denominator 2^k − 1, exact
    * FLOOR division. Division semantics (corrected round 7): BOTH
    * engines' integer division truncates toward zero (Spark `DIV` and
    * DuckDB 1.0.0 `//` alike — verified -5 // 3 = -1), which mis-buckets
    * negative numerators (refund-heavy days). Floor is therefore made
    * EXPLICIT on both sides: Spark via the pmod identity
    * `(num − pmod(num, denom)) DIV denom` (subtracting the NONNEGATIVE
    * remainder makes truncation equal floor at any sign and magnitude;
    * denominator 2^k−1 > 0 always), and the oracle via the mirrored
    * `(num - ((num % denom) + denom) % denom) // denom` — bit-identical
    * term by term since DuckDB `%` matches Spark `%`. On the nonnegative
    * fixture the correction term is 0 — hashes unchanged. The streaming
    * twin applies the same semantics as `Math.floorDiv`.
    * α = 1/2 makes every weight a power of two, so the
    * smoothing that is normally float-recurrence territory (and therefore
    * partition-order-dependent) becomes exact, layout-independent integer
    * arithmetic — the §7.2 determinism discipline applied to time-series
    * smoothing. Emits each user's 3 most recent smoothed days.
    *
    * Scale: one (user, day) agg + windows on one user partitioning;
    * window state is a ≤16-element list regardless of history length.
    */
  def q162_ewma(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 1e6).cast("long")).as("micro"))
    val wList = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(-15, 0)
    val wLast = Window.partitionBy(col("user_id")).orderBy(col("day").desc)
    daily
      .withColumn("lst", collect_list(col("micro")).over(wList))
      .withColumn("k", size(col("lst")))
      .withColumn("num", aggregate(reverse(col("lst")), lit(0L),
        (acc, x) => acc * 2 + x))
      .withColumn("denom",
        expr("shiftleft(CAST(1 AS BIGINT), k) - CAST(1 AS BIGINT)"))
      .withColumn("ewma_micro", expr("(num - pmod(num, denom)) DIV denom"))
      .withColumn("rn", row_number().over(wLast))
      .filter(col("rn") <= 3)
      .select(col("user_id"), col("day"), col("k").cast("long").as("n_obs"),
        col("ewma_micro"))
      .orderBy(col("user_id"), col("day"))
  }

  /** q163: entity-resolution clustering — q145's fuzzy best-match pairs
    * become an undirected graph, connected components
    * ([[Components.connectedComponents]], the q100 operator on a second
    * graph family) give each customer a canonical entity id (= min member
    * key) and entity size. The end-to-end ER pipeline: block → match →
    * cluster → canonicalize.
    *
    * Scale: match edges are ≤1 per dirty record by construction, so the
    * graph is vertex-linear; components converge in diameter rounds
    * (collision chains are short) — same argument as q100.
    */
  def q163_entity_clusters(spark: SparkSession, sfDir: String): DataFrame = {
    // the match pipeline is the expensive side and Components' internal
    // edge cache is released before the lazy result is consumed — cut the
    // lineage HERE so the blocked levenshtein join runs once, not once per
    // downstream consumption (the component map is consumed twice below)
    val edges = JoinQueries.q145_fuzzy_match(spark, sfDir)
      .select(col("dirty_id").as("a"), col("match_id").as("b"))
      .transform(graft.functions.Checkpoints.cut(_))
    val cc = Components.connectedComponents(edges, "a", "b")
      .transform(graft.functions.Checkpoints.cut(_))
    val sizes = cc.groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"))
    cc.join(sizes, "component")
      .select(col("id"), col("component").as("entity_id"), col("n_members"))
      .orderBy(col("id"))
  }

  /** q164: kNN majority-vote classification over the embedding corpus —
    * the label-propagation / weak-supervision primitive: probes
    * (vec_id % 50 == 0) take the majority label of their 5 nearest
    * cosine neighbors (ties → smaller label id). Emits predicted vs
    * stored label per probe.
    *
    * Scale: probe side broadcast (bounded candidate set — the q82
    * argument); at corpus-×-corpus scale the neighbor search swaps to
    * the IVF/SRP paths in [[graft.functions.Ann]] unchanged, because
    * the vote is a plain agg over whatever pair stream the ANN tier
    * emits.
    */
  def q164_knn_label_vote(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .filter(Det.saneEmb(col("embedding")))
    // norms hoisted out of the pair loop — the q82 rule (round 12)
    val probes = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("label").as("true_label"),
        col("embedding").as("pv"), Det.l2norm(col("embedding")).as("pn"))
    val corpus = e.select(col("vec_id").as("neighbor_id"),
      col("label").as("nl"), col("embedding").as("cv"),
      Det.l2norm(col("embedding")).as("cn"))
    val wK = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    // the probe side broadcasts, so the 400×|corpus| dot-product probe
    // executes in the corpus SCAN's stage — one task when embeddings fit
    // in one split (the q91/q145 pathology, BASELINE §4.0c); spread in
    // exactly that regime, identity at scale. Keyed windows downstream.
    val top5 = broadcast(probes)
      .crossJoin(graft.functions.Escalation.spreadIfNarrow(corpus))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", Det.r6(Det.dotD(col("pv"), col("cv")) /
        (col("pn") * col("cn"))))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= 5)
    val wVote = Window.partitionBy(col("probe_id"))
      .orderBy(col("votes").desc, col("pred_label").asc)
    top5.groupBy(col("probe_id"), col("true_label"),
        col("nl").as("pred_label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(wVote))
      .filter(col("vr") === 1)
      .select(col("probe_id"), col("true_label").cast("long").as("true_label"),
        col("pred_label").cast("long").as("pred_label"), col("votes"))
      .orderBy(col("probe_id"))
  }

  /** q165: spatial density stencil — supplier locations (q59's
    * deterministic lat/lon derivation) binned to 1°×1° grid cells, each
    * cell's density smoothed by summing its 3×3 neighborhood (the
    * scatter-to-neighbors form of a convolution stencil: every cell
    * scatters its count through a broadcast 9-row offset table, then one
    * re-agg). Top-20 hottest smoothed cells by (density desc, cx, cy).
    *
    * Scale: the stencil multiplies data volume by the fixed kernel size
    * (9), shuffles on cell key only, and never materializes the dense
    * grid — the sparse-heatmap shape that works identically at any
    * resolution. Pure integer counts.
    */
  def q165_grid_density(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val lat = col("s_nationkey").cast("double") * 3.0 - 36.0
    val lon = (col("s_suppkey") % 360).cast("double") - 180.0 +
      col("s_nationkey").cast("double") / 50.0
    val cells = Tables.supplier(spark, sfDir)
      .select(floor(lon).cast("long").as("cx"), floor(lat).cast("long").as("cy"))
      .groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n"))
    val offs = Seq(-1L, 0L, 1L).flatMap(dx => Seq(-1L, 0L, 1L).map(dy => (dx, dy)))
      .toDF("dx", "dy")
    val sm = cells.crossJoin(broadcast(offs))
      .groupBy((col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
      .agg(sum(col("n")).as("sm"))
    val wTop = Window.orderBy(col("sm").desc, col("cx").asc, col("cy").asc)
    cells.join(sm, Seq("cx", "cy"))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= 20)
      .select(col("cx"), col("cy"), col("n"), col("sm"), col("rank"))
      .orderBy(col("rank"))
  }

  /** q166: funnel latency percentiles — per ISO weekday of the first view,
    * the p50/p90 of seconds from each user's FIRST view to their first
    * LATER purchase. Percentiles via the integer crossing rule
    * (min value with 10·rank ≥ q·n — the q152 weighted-median discipline:
    * ties share a value, so the selected percentile is layout-independent
    * and no float interpolation exists to diverge).
    *
    * Scale: two per-user min-aggs + one bounded-alphabet grouping; the
    * percentile windows run per weekday over user-count rows.
    */
  def q166_time_to_convert(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("vus"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(v, "user_id").filter(col("us") > col("vus"))
      .groupBy(col("user_id")).agg(min(col("us")).as("pus"))
    val lat = p.join(v, "user_id")
      .select(col("user_id"),
        expr("weekday(timestamp_micros(vus)) + 1").cast("long").as("wday"),
        expr("(pus - vus) DIV 1000000").as("lat_s"))
    val wOrd = Window.partitionBy(col("wday"))
      .orderBy(col("lat_s").asc, col("user_id").asc)
    val wAll = Window.partitionBy(col("wday"))
    lat.withColumn("rn", row_number().over(wOrd))
      .withColumn("nw", count(lit(1)).over(wAll))
      .groupBy(col("wday"))
      .agg(count(lit(1)).as("n_users"),
        min(when(col("rn") * 10 >= col("nw") * 5, col("lat_s"))).as("p50_s"),
        min(when(col("rn") * 10 >= col("nw") * 9, col("lat_s"))).as("p90_s"))
      .orderBy(col("wday"))
  }

  /** q167: mutual information between event type and ISO weekday, in
    * integer micro-nats — the dependence screen feature pipelines run
    * next to q149's χ² (χ² weights large cells, MI weights information).
    * Each cell's term (p·ln(p/(pᵢpⱼ))) is computed from exact integer
    * counts in identical double operations on both engines, quantized to
    * micro-nats per cell, then integer-summed per event type — the q149
    * per-cell-quantization discipline applied to a log-family statistic.
    *
    * Scale: one agg to a |types|×7 contingency table; windows over that
    * bounded table; the log never sees corpus-sized input.
    */
  def q167_mutual_info(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("weekday(ts) + 1").cast("long").as("wday"))
      .agg(count(lit(1)).as("nij"))
    val wi = Window.partitionBy(col("event_type"))
    val wj = Window.partitionBy(col("wday"))
    val wAll = Window.partitionBy()
    cells
      .withColumn("ni", sum(col("nij")).over(wi))
      .withColumn("nj", sum(col("nij")).over(wj))
      .withColumn("n", sum(col("nij")).over(wAll))
      .withColumn("term_micro",
        round(lit(1000000.0) * ((col("nij").cast("double") / col("n").cast("double")) *
          log((col("nij").cast("double") * col("n").cast("double")) /
            (col("ni").cast("double") * col("nj").cast("double")))))
          .cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_cells"), sum(col("term_micro")).as("mi_micro"))
      .orderBy(col("event_type"))
  }

  /** q168: weekday seasonal index per event type, exact to the basis
    * point: index_bp = 10000 · (weekday mean / overall mean) computed as
    * one integer expression 10000·Σ_tw·n_t DIV (Σ_t·n_tw) over cent sums
    * — no float means, no division until the final integer DIV, so the
    * result is layout-independent (the q149/q167 bounded-table family,
    * rational arithmetic instead of logs). At sums beyond ~10¹⁴ cents the
    * numerator needs the decimal widening q58 documents; the shape is
    * unchanged. Division semantics (corrected round 7): the numerator
    * 10⁴·s·nt can go negative on refund-heavy weekdays, where bare
    * truncating division (Spark `DIV` and DuckDB `//` BOTH truncate)
    * would mis-index below the mean — floored explicitly on both sides,
    * Spark via the q162 pmod identity and the oracle via its mirrored
    * `%`-form, valid for any numerator at any magnitude. The denominator
    * st·n must stay positive (total spend > 0 per type) — that remaining
    * contract is inherent to "index relative to the overall mean", not a
    * division artifact.
    *
    * Scale: one agg to the |types|×7 table, windows over it.
    */
  def q168_seasonal_index(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("weekday(ts) + 1").cast("long").as("wday"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("wday"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
    val wi = Window.partitionBy(col("event_type"))
    cells
      .withColumn("nt", sum(col("n")).over(wi))
      .withColumn("st", sum(col("s")).over(wi))
      .withColumn("seasonal_bp",
        expr("(10000 * s * nt - pmod(10000 * s * nt, st * n)) DIV (st * n)"))
      .select(col("event_type"), col("wday"), col("n"), col("seasonal_bp"))
      .orderBy(col("event_type"), col("wday"))
  }

  /** q169: change-point detection per event type — the split day
    * maximizing the prefix-vs-suffix mean shift of daily spend (the
    * CUSUM-style screen monitoring pipelines run). Daily cent sums and
    * counts, running prefix via one window, shift = pre-mean − post-mean
    * in micro-cents (identical double ops on exact integers, rounded per
    * candidate before the argmax — so the chosen day is tie-broken
    * deterministically on the quantized score).
    *
    * Scale: the log collapses to |types|×|days| once; windows over that
    * bounded table.
    */
  def q169_changepoint(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("dn"),
        sum(round(col("value") * 100).cast("long")).as("dc"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    val scored = daily
      .withColumn("cn", sum(col("dn")).over(wCum))
      .withColumn("cc", sum(col("dc")).over(wCum))
      .withColumn("tn", sum(col("dn")).over(wAll))
      .withColumn("tc", sum(col("dc")).over(wAll))
      .filter(col("cn") > 0 && col("tn") > col("cn"))
      .withColumn("shift_micro",
        round(lit(1000000.0) *
          (col("cc").cast("double") / col("cn").cast("double") -
            (col("tc") - col("cc")).cast("double") /
              (col("tn") - col("cn")).cast("double"))).cast("long"))
    val wBest = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("shift_micro")).desc, col("day").asc)
    scored.withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("change_day"),
        col("shift_micro"))
      .orderBy(col("event_type"))
  }

  /** q170: cohort lifetime value — users cohorted by first-seen epoch
    * week, purchase revenue accumulated by weeks-since-cohort: the
    * (cohort, age) → cumulative-revenue triangle every growth dashboard
    * draws. Exact integer cents; epoch-week arithmetic (days DIV 7) is
    * identical integer math in both engines.
    *
    * Scale: one per-user min, one join back to purchases on user_id, one
    * (cohort, age) agg, a window over the bounded cohort×age triangle.
    */
  def q170_cohort_ltv(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("cents"))
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"))
      .select(col("user_id"),
        expr("CAST(datediff(first_day, DATE '1970-01-01') AS BIGINT) DIV 7")
          .as("cohort_wk"))
    val sizes = cohort.groupBy(col("cohort_wk"))
      .agg(count(lit(1)).as("n_users"))
    val rev = ev.filter(col("event_type") === "purchase")
      .join(cohort, "user_id")
      .withColumn("age_wk",
        expr("CAST(datediff(day, DATE '1970-01-01') AS BIGINT) DIV 7") -
          col("cohort_wk"))
      .groupBy(col("cohort_wk"), col("age_wk"))
      .agg(sum(col("cents")).as("wk_cents"))
    val wCum = Window.partitionBy(col("cohort_wk")).orderBy(col("age_wk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.withColumn("cum_cents", sum(col("wk_cents")).over(wCum))
      .join(sizes, "cohort_wk")
      .select(col("cohort_wk"), col("age_wk"), col("n_users"),
        col("cum_cents"))
      .orderBy(col("cohort_wk"), col("age_wk"))
  }

  /** q171: lag-7 autocorrelation of total daily spend — the weekly-
    * periodicity screen (is there a 7-day cycle worth modeling?). Pearson
    * r between (xₜ, xₜ₋₇) on q142's exact-integer-moment discipline: six
    * integer sums over cent-valued daily totals, cast to double once,
    * combined in the same literal order in both engines, r4. The
    * single-series window runs over the |days| aggregate (a comment-worthy
    * single partition — its input is calendar-bounded, never the log).
    * Σxy stays under 2⁶³ through ~3·10³ days at 10⁸ cents/day; longer
    * series re-quantize to dollars (shape unchanged).
    */
  def q171_lag_autocorr(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("x"))
    val wLag = Window.orderBy(col("day"))
    val pairs = daily
      .withColumn("y", lag(col("x"), 7).over(wLag))
      .filter(col("y").isNotNull)
    val m = pairs.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
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
    m.filter(col("n") > 1)
      .withColumn("vx", vx).withColumn("vy", vy)
      .filter(col("vx") > 0 && col("vy") > 0)
      .select(col("n"),
        Det.r4(num / (sqrt(col("vx")) * sqrt(col("vy")))).as("r7"))
  }

  /** Additive seasonal decomposition (q201, STL-lite): per event type,
    * daily cent totals split into trend + weekday-seasonal + residual —
    * the decomposition behind anomaly review (q169 flags a change-point;
    * this explains how much of it is trend vs weekday shape vs noise).
    * Composes the pieces q162/q168/q169 use separately: trend = centered
    * 7-row moving average (NULL on the 3-row edges; truncating `div 7`
    * on both engines, engine-identical at any sign), detrended = cents − trend, seasonal = per-(type,
    * ISO-weekday) mean of the detrended series, residual = detrended −
    * seasonal.
    *
    * Exactness: the seasonal mean's numerator can be NEGATIVE, where
    * bare truncating division (both engines truncate) is not floor — the
    * q197 shift trick applies with K=10¹²: (Σdetr + K·n) div n − K is
    * the exact floor on both engines (the shifted numerator is positive,
    * where truncation IS floor) (|detr| < K by construction at any
    * fixture scale; widen K with decimal past that, q168 note). SUM and
    * COUNT over windows skip NULLs identically in both engines.
    *
    * Scale shape: one two-phase (type, day) agg collapses the log;
    * every window after runs over the calendar-bounded daily frame
    * (the q149/q168/q169 argument).
    */
  def q201_seasonal_decompose(spark: SparkSession,
                              sfDir: String): DataFrame = {
    val d = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr(Det.epochDaySql("ts")).as("day"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("cents"))
    val w7 = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val t = d
      .withColumn("s7", sum(col("cents")).over(w7))
      .withColumn("c7", count(lit(1)).over(w7))
      .withColumn("trend", expr("case when c7 = 7 then s7 div 7 end"))
      .withColumn("detr", col("cents") - col("trend"))
      // pmod: weekday keys must stay in [0, 7) on pre-epoch days
      // (% is sign-of-dividend on both engines; oracle mirrors)
      .withColumn("wd", expr("pmod(day + 4, 7)"))
    val ww = Window.partitionBy(col("event_type"), col("wd"))
    t.withColumn("sd", sum(col("detr")).over(ww))
      .withColumn("cd", count(col("detr")).over(ww))
      .withColumn("seasonal", expr("case when cd > 0 then " +
        "(sd + 1000000000000 * cd) div cd - 1000000000000 end"))
      .select(col("event_type"), col("day"), col("cents"), col("trend"),
        col("seasonal"), (col("detr") - col("seasonal")).as("resid"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Forecast backtest (q205): seasonal-naive baseline — forecast(d) =
    * actual(d−7), the standard floor every real forecaster must beat —
    * scored per event type over the days where the lag exists: MAE in
    * cents and weighted MAPE (WAPE) in bp. This is the EVALUATION member
    * of the time-series tier (q162 smooths, q168 indexes, q201
    * decomposes — this one says how predictable the series actually is;
    * a type whose WAPE is already ≤ its seasonal-naive floor needs no
    * model).
    *
    * Exactness: |cents − fcst| is an exact BIGINT; both ratios floor
    * once with non-negative numerators (nullif-guarded). WAPE weights by
    * actual volume — the per-day-MAPE mean a zero-volume day would
    * poison is deliberately not used.
    *
    * Scale shape: one two-phase (type, day) agg collapses the log; the
    * lag-7 window and the rollup run over the calendar-bounded daily
    * frame (q201's argument).
    */
  def q205_forecast_backtest(spark: SparkSession,
                             sfDir: String): DataFrame = {
    val d = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr(Det.epochDaySql("ts")).as("day"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("c")).as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    d.withColumn("fcst", lag(col("cents"), 7).over(w))
      .groupBy(col("event_type"))
      .agg(count(col("fcst")).as("n_days"),
        sum(abs(col("cents") - col("fcst"))).as("sae"),
        sum(when(col("fcst").isNotNull, col("cents"))).as("act"))
      .select(col("event_type"), col("n_days"),
        expr("sae div nullif(n_days, 0)").as("mae_cents"),
        expr("sae * 10000 div nullif(act, 0)").as("wape_bp"))
      .orderBy(col("event_type"))
  }

  /** Lagged cross-correlation (q210): Pearson r between the daily
    * 'view' count series and the 'purchase' count series shifted by
    * lag ∈ [0, 7] days — the lead/lag discovery step behind every
    * marketing-response and capacity model ("browsing today predicts
    * buying in how many days?"); the bivariate, cross-series member of
    * the time-series tier (q171 is one series vs itself; q142 is
    * within-row bivariate).
    *
    * Exactness: both series are ZERO-FILLED onto the dense daily grid
    * (explode(sequence) off a 1-row broadcast — missing days are real
    * zeros, not dropped rows; dropping them biases r upward), so counts
    * and all six moments are exact BIGINTs; r follows q142's discipline —
    * moments cast to double once, combined in one literal order, r4
    * rounding. Zero-variance lags drop (guard, not NaN).
    *
    * Scale shape: the log collapses at (type, day) grain in one
    * two-phase agg; everything after — dense grid, 8-row lag frame, the
    * self-join at day+lag, the per-lag moment agg — runs on
    * calendar-bounded frames (q150/q171 argument). The corpus is
    * touched exactly once.
    */
  def q210_lagged_xcorr(spark: SparkSession, sfDir: String): DataFrame = {
    // ONE scan: both series come out of a single (day) conditional agg
    // (the naive per-series form scans the log once per series + once
    // for the span — 3× the I/O for the same numbers)
    val d = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_type"),
        expr(Det.epochDaySql("ts")).as("day"))
      .groupBy(col("day"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("xv"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("yv"))
    val span = d.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = span.select(
      explode(sequence(col("d0"), col("d1"))).as("gday"))
    val dense = grid.join(d, col("gday") === col("day"), "left")
      .select(col("gday"), coalesce(col("xv"), lit(0L)).as("x"),
        coalesce(col("yv"), lit(0L)).as("y"))
    val ys = dense.select(col("gday").as("yday"), col("y").as("yy"))
    val lags = spark.range(0L, 8L).select(col("id").as("lag"))
    val m = dense.crossJoin(broadcast(lags))
      .join(ys, col("yday") === col("gday") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"),
        sum(col("yy")).as("sy"), sum(col("x") * col("yy")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("yy") * col("yy")).as("syy"))
    val nd = col("n_days").cast("double")
    val vx = nd * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = nd * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    val num = nd * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    m.filter(col("n_days") > 1)
      .withColumn("vx", vx).withColumn("vy", vy)
      .filter(col("vx") > 0 && col("vy") > 0)
      .select(col("lag"), col("n_days"),
        Det.r4(num / (sqrt(col("vx")) * sqrt(col("vy")))).as("r"))
      .orderBy(col("lag"))
  }

  /** Daily burstiness / index of dispersion (q215): per event type the
    * Fano factor of the zero-filled daily count series — variance-to-
    * mean in bp (10⁴ = Poisson; far above = bursty/campaign-driven or
    * bot-pulsed; far below = rate-limited or synthetic-uniform). The
    * arrival-PROCESS screen next to q207 (value-distribution drift),
    * q169 (level change-points), and q171/q210 (serial structure) — a
    * bot that fires like clockwork has normal values and zero drift but
    * an un-Poisson Fano.
    *
    * Exactness: counts zero-filled onto the dense grid (q210's rule —
    * missing days ARE the signal for burstiness); Fano via the moment
    * identity (n·Σx² − S²)·10⁴ div (n·S) — all BIGINT, one floor,
    * numerator ≥ 0 by Cauchy–Schwarz so engine floors agree;
    * nullif-guards an all-zero type. Σx² bounded: 10¹¹ at 10⁴-row days
    * over 10³ days; widen to decimal past ~10¹⁴ (q168 note).
    *
    * Scale shape: the log collapses at (type, day) grain in one
    * two-phase agg; the grid fan-out and both rollups run on
    * calendar-bounded frames (q210's argument).
    */
  def q215_dispersion(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr(Det.epochDaySql("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("x"))
    // fresh exprIds (ty/gday) — the type list and the grid both descend
    // from `d`, and the join back would otherwise be an ambiguous
    // self-join (the q211 lesson)
    val days = d.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("gday"))
    val dense = d.select(col("event_type").as("ty")).distinct()
      .crossJoin(broadcast(days))
      .join(d, col("ty") === col("event_type") &&
        col("gday") === col("day"), "left")
      .select(col("ty"), coalesce(col("x"), lit(0L)).as("x"))
    dense.groupBy(col("ty"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("q"))
      .select(col("ty").as("event_type"), col("n_days"),
        expr("s * 1000 div n_days").as("mean_milli"),
        expr("(n_days * q - s * s) * 10000 div nullif(n_days * s, 0)")
          .as("fano_bp"))
      .orderBy(col("event_type"))
  }

  /** Robust daily-volume anomaly screen (q217): per event type, flag
    * days whose ZERO-FILLED daily count deviates from the type's median
    * by more than 3.5 modified z-scores (0.6745·|x−med|/MAD — the
    * Iglewicz–Hoaglin rule); median/MAD instead of q133's mean/σ so the
    * anomalies themselves can't mask the baseline (one 100× spike
    * inflates σ enough to hide the next one; it moves the median not at
    * all). The operational alert on the ARRIVAL series: q169 localizes
    * level shifts, q215 scores burstiness — this names the exact bad
    * days, including silent-zero outage days (the zero-fill is the
    * point).
    *
    * Exactness: median and MAD are integer lower-medians via the q166
    * crossing rule (rn·2 ≥ n) — no interpolation, no float; the flag
    * 6745·dev > 35000·mad and the reported score are single-floor
    * integer arithmetic; an all-constant series (MAD = 0) flags any
    * deviation and reports a NULL score (division undefined), pinned on
    * both engines. The report emits each type's TOP-3 most deviant days
    * with the flag (dev desc, day asc — deterministic), so the readout
    * is never empty on a quiet corpus (the fixture's uniform synthetic
    * series correctly flags nothing; the scores still hash-pin the
    * median/MAD math).
    *
    * Scale shape: the log collapses at (type, day) grain; the grid
    * fan-out, both crossing windows, and the flag join all run on
    * calendar-bounded per-type frames (q171's argument); median/MAD
    * frames join back broadcast (|types| rows).
    */
  def q217_daily_anomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr(Det.epochDaySql("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("x"))
    val days = d.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("gday"))
    val dense = d.select(col("event_type").as("ty")).distinct()
      .crossJoin(broadcast(days))
      .join(d, col("ty") === col("event_type") &&
        col("gday") === col("day"), "left")
      .select(col("ty"), col("gday"), coalesce(col("x"), lit(0L)).as("x"))
    val wMed = Window.partitionBy(col("ty"))
      .orderBy(col("x").asc, col("gday").asc)
    val med = dense
      .withColumn("rn", row_number().over(wMed).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("ty"))))
      .groupBy(col("ty"))
      .agg(min(when(col("rn") * 2 >= col("n"), col("x"))).as("med"))
      .select(col("ty").as("mty"), col("med"))
    val withDev = dense.join(broadcast(med), col("ty") === col("mty"))
      .withColumn("dev", abs(col("x") - col("med")))
    val wMad = Window.partitionBy(col("ty"))
      .orderBy(col("dev").asc, col("gday").asc)
    val mad = withDev
      .withColumn("rn", row_number().over(wMad).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("ty"))))
      .groupBy(col("ty"))
      .agg(min(when(col("rn") * 2 >= col("n"), col("dev"))).as("mad"))
      .select(col("ty").as("aty"), col("mad"))
    val wTop = Window.partitionBy(col("ty"))
      .orderBy(col("dev").desc, col("gday").asc)
    withDev.join(broadcast(mad), col("ty") === col("aty"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 3)
      .select(col("ty").as("event_type"), col("gday").as("day"), col("x"),
        col("med"), col("mad"),
        expr("dev * 6745 div nullif(mad * 10, 0)").as("score_milli"),
        ((col("mad") > 0 && col("dev") * 6745 > col("mad") * 35000) ||
          (col("mad") === 0 && col("dev") > 0)).as("anomalous"))
      .orderBy(col("event_type"), col("day"))
  }

  val oracle: Map[String, String] = Map(
    "q217_daily_anomaly" ->
      """WITH d AS (SELECT event_type, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    count(*) AS x FROM events GROUP BY 1, 2),
        |s AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
        |g AS (SELECT unnest(generate_series(d0, d1)) AS gday FROM s),
        |ty AS (SELECT DISTINCT event_type AS ty FROM d),
        |dense AS (SELECT ty.ty, g.gday, coalesce(d.x, 0) AS x
        |  FROM ty CROSS JOIN g
        |  LEFT JOIN d ON d.event_type = ty.ty AND d.day = g.gday),
        |r1 AS (SELECT ty, gday, x,
        |    row_number() OVER (PARTITION BY ty ORDER BY x, gday) AS rn,
        |    count(*) OVER (PARTITION BY ty) AS n FROM dense),
        |med AS (SELECT ty AS mty,
        |    CAST(min(CASE WHEN rn * 2 >= n THEN x END) AS BIGINT) AS med
        |  FROM r1 GROUP BY ty),
        |dev AS (SELECT dense.ty, gday, x, med, abs(x - med) AS dev
        |  FROM dense JOIN med ON dense.ty = med.mty),
        |r2 AS (SELECT ty, gday, x, med, dev,
        |    row_number() OVER (PARTITION BY ty ORDER BY dev, gday) AS rn,
        |    count(*) OVER (PARTITION BY ty) AS n FROM dev),
        |mad AS (SELECT ty AS aty,
        |    CAST(min(CASE WHEN rn * 2 >= n THEN dev END) AS BIGINT) AS mad
        |  FROM r2 GROUP BY ty),
        |j AS (SELECT dev.ty, gday, x, med, dev, mad,
        |    row_number() OVER (PARTITION BY dev.ty
        |      ORDER BY dev DESC, gday) AS rk
        |  FROM dev JOIN mad ON dev.ty = mad.aty)
        |SELECT ty AS event_type, gday AS day, CAST(x AS BIGINT) AS x,
        |  med, mad,
        |  CAST(dev * 6745 // nullif(mad * 10, 0) AS BIGINT) AS score_milli,
        |  ((mad > 0 AND dev * 6745 > mad * 35000)
        |    OR (mad = 0 AND dev > 0)) AS anomalous
        |FROM j WHERE rk <= 3
        |ORDER BY event_type, day""".stripMargin,
    "q215_dispersion" ->
      """WITH d AS (SELECT event_type, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    count(*) AS x FROM events GROUP BY 1, 2),
        |s AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
        |g AS (SELECT unnest(generate_series(d0, d1)) AS day FROM s),
        |ty AS (SELECT DISTINCT event_type FROM d),
        |dense AS (SELECT ty.event_type, coalesce(d.x, 0) AS x
        |  FROM ty CROSS JOIN g
        |  LEFT JOIN d ON d.event_type = ty.event_type AND d.day = g.day),
        |m AS (SELECT event_type, count(*) AS n_days,
        |    CAST(sum(x) AS BIGINT) AS s, CAST(sum(x * x) AS BIGINT) AS q
        |  FROM dense GROUP BY 1)
        |SELECT event_type, n_days,
        |  CAST(s * 1000 // n_days AS BIGINT) AS mean_milli,
        |  CAST((n_days * q - s * s) * 10000 // nullif(n_days * s, 0)
        |    AS BIGINT) AS fano_bp
        |FROM m ORDER BY event_type""".stripMargin,
    "q210_lagged_xcorr" ->
      """WITH d AS (SELECT event_type, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    count(*) AS n FROM events
        |  WHERE event_type IN ('view', 'purchase') GROUP BY 1, 2),
        |s AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
        |g AS (SELECT unnest(generate_series(d0, d1)) AS day FROM s),
        |xs AS (SELECT g.day, coalesce(v.n, 0) AS x FROM g
        |  LEFT JOIN (SELECT day, n FROM d WHERE event_type = 'view') v
        |    ON g.day = v.day),
        |ys AS (SELECT g.day AS yday, coalesce(p.n, 0) AS y FROM g
        |  LEFT JOIN (SELECT day, n FROM d WHERE event_type = 'purchase') p
        |    ON g.day = p.day),
        |l AS (SELECT unnest(generate_series(0, 7)) AS lag),
        |m AS (SELECT lag, count(*) AS n_days,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM xs CROSS JOIN l JOIN ys ON ys.yday = xs.day + l.lag
        |  GROUP BY lag)
        |SELECT CAST(lag AS BIGINT) AS lag, n_days,
        |  round((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * sqrt(CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) AS r
        |FROM m
        |WHERE n_days > 1
        |  AND CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |  AND CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
        |    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
        |ORDER BY lag""".stripMargin,
    "q205_forecast_backtest" ->
      """WITH d AS (SELECT event_type, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1, 2),
        |f AS (SELECT event_type, day, cents,
        |    lag(cents, 7) OVER (PARTITION BY event_type ORDER BY day)
        |      AS fcst
        |  FROM d)
        |SELECT event_type, count(fcst) AS n_days,
        |  CAST(sum(abs(cents - fcst)) // nullif(count(fcst), 0) AS BIGINT)
        |    AS mae_cents,
        |  CAST(sum(abs(cents - fcst)) * 10000
        |    // nullif(sum(CASE WHEN fcst IS NOT NULL THEN cents END), 0)
        |    AS BIGINT) AS wape_bp
        |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q201_seasonal_decompose" ->
      """WITH d AS (SELECT event_type, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, day, cents,
        |    CASE WHEN count(*) OVER w7 = 7
        |      THEN sum(cents) OVER w7 // 7 END AS trend
        |  FROM d WINDOW w7 AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |dt AS (SELECT event_type, day, cents, trend,
        |    cents - trend AS detr,
        |    (((day + 4) % 7) + 7) % 7 AS wd FROM t),
        |s AS (SELECT event_type, day, cents, trend, detr,
        |    CAST(CASE WHEN count(detr) OVER ww > 0 THEN
        |      (sum(detr) OVER ww + 1000000000000 * count(detr) OVER ww)
        |        // count(detr) OVER ww - 1000000000000 END AS BIGINT)
        |      AS seasonal
        |  FROM dt WINDOW ww AS (PARTITION BY event_type, wd))
        |SELECT event_type, day, cents, trend, seasonal,
        |  detr - seasonal AS resid
        |FROM s ORDER BY event_type, day""".stripMargin,
    "q168_seasonal_index" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(isodow(ts) AS BIGINT) AS wday,
        |    count(*) AS n,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, wday, n, s,
        |    sum(n) OVER (PARTITION BY event_type) AS nt,
        |    sum(s) OVER (PARTITION BY event_type) AS st
        |  FROM cells)
        |SELECT event_type, wday, n,
        |  CAST((10000 * s * nt - ((10000 * s * nt % (st * n)) + (st * n))
        |      % (st * n)) // (st * n) AS BIGINT) AS seasonal_bp
        |FROM t ORDER BY event_type, wday""".stripMargin,
    "q169_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS dn,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS dc
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, day,
        |    sum(dn) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS cn,
        |    sum(dc) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS cc,
        |    sum(dn) OVER (PARTITION BY event_type) AS tn,
        |    sum(dc) OVER (PARTITION BY event_type) AS tc
        |  FROM daily),
        |s AS (
        |  SELECT event_type, day,
        |    CAST(round(1000000.0 *
        |      (CAST(cc AS DOUBLE) / CAST(cn AS DOUBLE) -
        |       CAST(tc - cc AS DOUBLE) / CAST(tn - cn AS DOUBLE)))
        |      AS BIGINT) AS shift_micro
        |  FROM c WHERE cn > 0 AND tn > cn),
        |r AS (
        |  SELECT event_type, day, shift_micro,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY abs(shift_micro) DESC, day ASC) AS rn
        |  FROM s)
        |SELECT event_type, day AS change_day, shift_micro
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "q170_cohort_ltv" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(ts AS DATE) AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |cohort AS (
        |  SELECT user_id,
        |    (min(day) - DATE '1970-01-01') // 7 AS cohort_wk
        |  FROM ev GROUP BY 1),
        |sizes AS (SELECT cohort_wk, count(*) AS n_users
        |  FROM cohort GROUP BY 1),
        |rev AS (
        |  SELECT c.cohort_wk,
        |    (e.day - DATE '1970-01-01') // 7 - c.cohort_wk AS age_wk,
        |    CAST(sum(e.cents) AS BIGINT) AS wk_cents
        |  FROM ev e JOIN cohort c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' GROUP BY 1, 2),
        |cum AS (
        |  SELECT cohort_wk, age_wk,
        |    CAST(sum(wk_cents) OVER (PARTITION BY cohort_wk ORDER BY age_wk
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
        |  FROM rev)
        |SELECT cum.cohort_wk AS cohort_wk, CAST(cum.age_wk AS BIGINT) AS age_wk,
        |  sizes.n_users, cum.cum_cents
        |FROM cum JOIN sizes ON cum.cohort_wk = sizes.cohort_wk
        |ORDER BY cum.cohort_wk, age_wk""".stripMargin,
    "q171_lag_autocorr" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT x, lag(x, 7) OVER (ORDER BY day) AS y FROM daily),
        |m AS (
        |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM p WHERE y IS NOT NULL)
        |SELECT n,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |         CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |        (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |              CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |         sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |              CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) AS r7
        |FROM m
        |WHERE n > 1
        |  AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |  AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0""".stripMargin,
    "q160_item_cooccur_sim" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |freq AS (SELECT p, count(*) AS f FROM lp GROUP BY 1),
        |pr AS (
        |  SELECT a.p AS pa, b.p AS pb, count(*) AS cooc
        |  FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p
        |  WHERE a.p % 100 = 0 OR b.p % 100 = 0
        |  GROUP BY 1, 2),
        |sym AS (
        |  SELECT pa AS part_a, pb AS part_b, cooc FROM pr
        |  UNION ALL
        |  SELECT pb, pa, cooc FROM pr),
        |scored AS (
        |  SELECT s.part_a, s.part_b, s.cooc,
        |    round(CAST(s.cooc AS DOUBLE) /
        |      sqrt(CAST(fa.f AS DOUBLE) * CAST(fb.f AS DOUBLE)), 6) AS sim
        |  FROM sym s
        |  JOIN freq fa ON s.part_a = fa.p
        |  JOIN freq fb ON s.part_b = fb.p
        |  WHERE s.part_a % 100 = 0),
        |ranked AS (
        |  SELECT part_a, part_b, cooc, sim,
        |    row_number() OVER (PARTITION BY part_a
        |      ORDER BY sim DESC, part_b ASC) AS rank
        |  FROM scored)
        |SELECT part_a, part_b, cooc, sim, CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 3 ORDER BY part_a, rank""".stripMargin,
    "q161_path_trigrams" ->
      """WITH e AS (SELECT user_id, event_id, event_type, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ts
        |  FROM events),
        |s AS (SELECT user_id, event_id, event_type, ts,
        |    sum(CASE WHEN prev_ts IS NULL
        |          OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM e),
        |t AS (SELECT event_type,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM s
        |  WINDOW w AS (PARTITION BY user_id, session_seq
        |    ORDER BY ts, event_id)),
        |p AS (SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n
        |  FROM t WHERE e3 IS NOT NULL GROUP BY 1),
        |r AS (SELECT path, n,
        |    row_number() OVER (ORDER BY n DESC, path ASC) AS rank
        |  FROM p)
        |SELECT path, n, CAST(rank AS BIGINT) AS rank FROM r
        |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "q162_ewma" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS micro
        |  FROM events GROUP BY 1, 2),
        |idx AS (SELECT user_id, day, micro,
        |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        |  FROM daily),
        |ew AS (
        |  SELECT a.user_id, a.day,
        |    CAST(least(a.rn, 16) AS BIGINT) AS n_obs,
        |    CAST(sum(b.micro * (CAST(1 AS BIGINT) <<
        |        CAST(least(a.rn, 16) - 1 - (a.rn - b.rn) AS INTEGER)))
        |      AS BIGINT) AS num
        |  FROM idx a JOIN idx b
        |    ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 15 AND a.rn
        |  GROUP BY a.user_id, a.day, a.rn),
        |den AS (SELECT *,
        |    ((CAST(1 AS BIGINT) << CAST(n_obs AS INTEGER)) - 1) AS denom
        |  FROM ew),
        |lastd AS (SELECT user_id, day, n_obs,
        |    (num - ((num % denom) + denom) % denom) // denom AS ewma_micro,
        |    row_number() OVER (PARTITION BY user_id ORDER BY day DESC) AS rd
        |  FROM den)
        |SELECT user_id, day, n_obs, CAST(ewma_micro AS BIGINT) AS ewma_micro
        |FROM lastd WHERE rd <= 3 ORDER BY user_id, day""".stripMargin,
    "q163_entity_clusters" ->
      """WITH RECURSIVE c AS (SELECT c_custkey AS id, c_name AS name FROM customer),
        |d AS (
        |  SELECT id,
        |    CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % 6 AS p,
        |    CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 9, 8)) AS BIGINT)
        |      % 9 AS off,
        |    substr(name, 10, 9) AS sfx
        |  FROM c),
        |dirty AS (
        |  SELECT id AS dirty_id,
        |    'Customer#' || substr(sfx, 1, CAST(p AS INTEGER)) ||
        |    CAST((CAST(substr(sfx, CAST(p + 1 AS INTEGER), 1) AS BIGINT)
        |          + 1 + off) % 10 AS VARCHAR) ||
        |    substr(sfx, CAST(p + 2 AS INTEGER)) AS dname,
        |    substr(sfx, 7, 3) AS blk
        |  FROM d),
        |cand AS (
        |  SELECT dirty_id, c.id AS match_id, levenshtein(dname, c.name) AS dist
        |  FROM dirty JOIN c ON substr(c.name, 16, 3) = dirty.blk
        |  WHERE levenshtein(dname, c.name) <= 1),
        |best AS (
        |  SELECT dirty_id, match_id,
        |         row_number() OVER (PARTITION BY dirty_id
        |                            ORDER BY dist, match_id) AS rn
        |  FROM cand),
        |e AS (SELECT dirty_id AS s, match_id AS t FROM best WHERE rn = 1
        |      UNION SELECT match_id, dirty_id FROM best WHERE rn = 1),
        |nodes AS (SELECT DISTINCT s AS id FROM e),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT reach.id, e.t FROM reach JOIN e ON reach.r = e.s),
        |cc AS (SELECT id, min(r) AS entity_id FROM reach GROUP BY id),
        |sz AS (SELECT entity_id AS e2, count(*) AS n_members FROM cc GROUP BY 1)
        |SELECT id, entity_id, n_members
        |FROM cc JOIN sz ON entity_id = e2 ORDER BY id""".stripMargin,
    "q164_knn_label_vote" ->
      s"""WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |  WHERE ${Det.saneEmbSql()}),
        |sims AS (
        |  SELECT p.vec_id AS probe_id, p.label AS true_label,
        |    c.vec_id AS neighbor_id, c.label AS nl,
        |    round(list_dot_product(p.v, c.v) /
        |      (sqrt(list_dot_product(p.v, p.v)) *
        |       sqrt(list_dot_product(c.v, c.v))), 6) AS cos_sim
        |  FROM e p JOIN e c ON p.vec_id % 50 = 0 AND p.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT probe_id, true_label, nl,
        |    row_number() OVER (PARTITION BY probe_id
        |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
        |  FROM sims),
        |votes AS (
        |  SELECT probe_id, true_label, nl AS pred_label, count(*) AS votes
        |  FROM ranked WHERE rank <= 5 GROUP BY 1, 2, 3),
        |win AS (
        |  SELECT probe_id, true_label, pred_label, votes,
        |    row_number() OVER (PARTITION BY probe_id
        |      ORDER BY votes DESC, pred_label ASC) AS vr
        |  FROM votes)
        |SELECT probe_id, CAST(true_label AS BIGINT) AS true_label,
        |  CAST(pred_label AS BIGINT) AS pred_label, votes
        |FROM win WHERE vr = 1 ORDER BY probe_id""".stripMargin,
    "q165_grid_density" ->
      """WITH s AS (
        |  SELECT CAST(floor((s_suppkey % 360) - 180.0 +
        |      CAST(s_nationkey AS DOUBLE) / 50.0) AS BIGINT) AS cx,
        |    CAST(floor(CAST(s_nationkey AS DOUBLE) * 3.0 - 36.0) AS BIGINT) AS cy
        |  FROM supplier),
        |cells AS (SELECT cx, cy, count(*) AS n FROM s GROUP BY 1, 2),
        |offs AS (SELECT dx.dx, dy.dy
        |  FROM (SELECT unnest([-1, 0, 1]) AS dx) dx,
        |       (SELECT unnest([-1, 0, 1]) AS dy) dy),
        |sm AS (
        |  SELECT cx + dx AS cx, cy + dy AS cy, CAST(sum(n) AS BIGINT) AS sm
        |  FROM cells CROSS JOIN offs GROUP BY 1, 2),
        |r AS (
        |  SELECT cells.cx, cells.cy, cells.n, sm.sm,
        |    row_number() OVER (ORDER BY sm.sm DESC, cells.cx, cells.cy) AS rank
        |  FROM cells JOIN sm ON cells.cx = sm.cx AND cells.cy = sm.cy)
        |SELECT cx, cy, n, sm, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin,
    "q166_time_to_convert" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, ts
        |  FROM events),
        |v AS (SELECT user_id, min(us) AS vus FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT ev.user_id, min(ev.us) AS pus
        |  FROM ev JOIN v ON ev.user_id = v.user_id
        |  WHERE ev.event_type = 'purchase' AND ev.us > v.vus GROUP BY 1),
        |lat AS (
        |  SELECT p.user_id,
        |    CAST(isodow(make_timestamp(v.vus)) AS BIGINT) AS wday,
        |    (p.pus - v.vus) // 1000000 AS lat_s
        |  FROM p JOIN v ON p.user_id = v.user_id),
        |r AS (SELECT wday, user_id, lat_s,
        |    row_number() OVER (PARTITION BY wday
        |      ORDER BY lat_s ASC, user_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY wday) AS nw
        |  FROM lat)
        |SELECT wday, count(*) AS n_users,
        |  min(CASE WHEN rn * 10 >= nw * 5 THEN lat_s END) AS p50_s,
        |  min(CASE WHEN rn * 10 >= nw * 9 THEN lat_s END) AS p90_s
        |FROM r GROUP BY wday ORDER BY wday""".stripMargin,
    "q167_mutual_info" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(isodow(ts) AS BIGINT) AS wday,
        |    count(*) AS nij
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, wday, nij,
        |    sum(nij) OVER (PARTITION BY event_type) AS ni,
        |    sum(nij) OVER (PARTITION BY wday) AS nj,
        |    sum(nij) OVER () AS n
        |  FROM cells),
        |terms AS (
        |  SELECT event_type,
        |    CAST(round(1000000.0 * ((CAST(nij AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      ln((CAST(nij AS DOUBLE) * CAST(n AS DOUBLE)) /
        |         (CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE))))) AS BIGINT)
        |      AS term_micro
        |  FROM t)
        |SELECT event_type, count(*) AS n_cells,
        |  CAST(sum(term_micro) AS BIGINT) AS mi_micro
        |FROM terms GROUP BY 1 ORDER BY event_type""".stripMargin)
}

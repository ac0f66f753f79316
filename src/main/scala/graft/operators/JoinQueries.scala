package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.2.B — joins. The reference merged fetched datasets client-side with
  * Ruby Enumerable (SURVEY.md §2.1); here every join is declarative so
  * Catalyst/AQE pick the physical algorithm.
  *
  * Scale notes (100 TB): only the CARDINALITY-BOUNDED dimensions (region:
  * 5 rows, nation: 25 rows — fixed by the data model at any sf) carry an
  * explicit `broadcast()` hint. customer/supplier/part GROW LINEARLY with
  * the corpus (FIXTURES.md: 150→15,000 rows across three decades of sf;
  * ~15 B customer rows at 100 TB), so hinting them would bypass Spark's
  * size threshold unconditionally and OOM every executor at scale — the
  * q92 rule (never hint a frame whose cardinality scales with the corpus).
  * Unhinted, Spark still picks a broadcast-hash join whenever the side is
  * actually under `autoBroadcastJoinThreshold` (it is at every fixture
  * sf — PlanShapeSpec pins q11's five BHJs), and degrades to a shuffle
  * join, not an OOM, when it is not. The multiway q11 joins facts first
  * on their co-partitioned keys, dims last. The as-of join
  * (q16) is a union + running `last(..., ignoreNulls)` window — one shuffle
  * by user_id, no range-join explosion, and it scales linearly with events
  * per user.
  */
object JoinQueries {

  def q10_join_inner(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"),
        Det.r2(col("o_totalprice")).as("o_totalprice"))
      .orderBy(col("o_orderkey"))
      .limit(1000)

  /** TPC-H Q5 shape: revenue by nation for ASIA customers whose supplier is
    * in the same nation. Facts join facts on keys; all four dims broadcast.
    *
    * Revenue accumulates in DECIMAL, not double (round-9 close-out): a
    * double sum's final ulps depend on accumulation order, and `round(_,2)`
    * only absorbs that while the true sum sits away from a half-cent
    * boundary — at sf1 the scan-split change moved one nation's sum across
    * such a boundary and flipped the last cent vs the oracle. The inputs
    * are exact 2-dp money (fixture-verified), so casting them to
    * decimal(12,2) is lossless and the decimal sum is exact and
    * order-independent; the final cast to double rounds the same exact
    * value on both engines. The oracle mirrors every cast.
    */
  def q11_join_multiway(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)),
        col("n_regionkey") === col("r_regionkey") && col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(Det.r2(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(12,2)")))
        .cast("double")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  def q12_join_left_outer(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(
        Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_p_orders"))
      .orderBy(col("n_p_orders").desc, col("c_custkey"))

  def q13_join_semi(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(
        Tables.orders(spark, sfDir).filter(col("o_totalprice") > 490000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  def q14_join_anti(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(
        Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))

  /** Theta join. `sum_qty` is the money-sum rule's documented exception
    * (Det.scala): l_quantity is integral (1–50, FIXTURES.md:88), so every
    * partial double sum is an exact integer far below 2^53 — exact at any
    * accumulation order, no decimal accumulation needed.
    */
  def q15_join_theta(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir),
        col("l_partkey") === col("p_partkey") &&
          col("l_quantity") > col("p_size"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), Det.r2(sum(col("l_quantity"))).as("sum_qty"))
      .orderBy(col("p_brand"))

  /** Left as-of join: for each purchase, the most recent signup of the same
    * user with (ts, event_id) <= the purchase's (ts, event_id).
    *
    * Formulation: single pass over events per user ordered by (ts, event_id)
    * carrying `last(signup_id, ignoreNulls)` — O(n log n) in the sort, one
    * shuffle on user_id, no join at all. At 100 TB this beats a range join:
    * state is one value per user, and the sort is the same one a
    * time-windowed pipeline already needs.
    */
  def q16_join_asof(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .withColumn("signup_id",
        when(col("event_type") === "signup", col("event_id")))
      .withColumn("signup_event_id",
        last(col("signup_id"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("signup_event_id"))
      .orderBy(col("event_id"))
  }

  /** The general library as-of join ([[Asof.join]]) between two distinct
    * tables: each purchase picks up the user's most recent click at-or-
    * before it (event_id tie-break). Same one-shuffle union+window plan as
    * q16, but produced by the reusable operator rather than an inline
    * formulation — this is the entry that keeps `Asof.join` itself under
    * the hash gate.
    */
  def q19_join_asof_generic(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    Asof.join(purchases, clicks, on = Seq("user_id"),
        leftAt = "ts", rightAt = "ts", rightPrefix = "click_",
        tieBreak = Seq("event_id"))
      .select(col("event_id"), col("click_event_id"),
        Det.r2(col("click_value")).as("click_value"))
      .orderBy(col("event_id"))
  }

  /** MERGE/upsert — the CDC-apply operator ([[Upsert.applyCdc]]) under the
    * hash gate (round 4): a deterministic change set derived from orders
    * (keys ≡0 mod 100 → price update, ≡1 → delete, ≡2 → insert as a new
    * key) is merged into the base snapshot. One shuffle on the key via
    * union + priority window — no join.
    */
  def q77_upsert_merge(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.orders(spark, sfDir)
    val m = col("o_orderkey") % 100
    val upd = base.filter(m === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 10000.0)
      .withColumn("op", lit("u"))
    val del = base.filter(m === 1).withColumn("op", lit("d"))
    val ins = base.filter(m === 2)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("op", lit("u"))
    val changes = upd.unionByName(del).unionByName(ins)
    Upsert.applyCdc(base, changes, keys = Seq("o_orderkey"), opCol = "op")
      .select(col("o_orderkey"), col("o_orderstatus"),
        Det.r2(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderkey"))
  }

  /** Full outer join with rows unmatched on BOTH sides: negative-balance
    * customers ⟗ customers holding a >490k order.
    */
  def q18_join_full_outer(spark: SparkSession, sfDir: String): DataFrame = {
    val a = Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") < 0)
      .select(col("c_custkey"), Det.r2(col("c_acctbal")).as("neg_bal"))
    val b = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 490000)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_big"))
    a.join(b, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("neg_bal"), col("n_big"))
      .orderBy(col("custkey"))
  }

  def q17_join_cross(spark: SparkSession, sfDir: String): DataFrame =
    Tables.region(spark, sfDir).select(col("r_name"))
      .crossJoin(Tables.nation(spark, sfDir).select(col("n_name")))
      .orderBy(col("r_name"), col("n_name"))

  /** Correlated subqueries (round 3): a scalar COUNT subquery and a
    * correlated EXISTS, written as SQL — Catalyst de-correlates both into
    * the aggregate + semi-join plan you would hand-write (this is the
    * showcase: the declarative subquery costs nothing over the manual
    * join), which is why no dedicated "subquery operator" exists in the
    * DataFrame surface.
    */
  def q46_subquery(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("graft_cust_sq")
    Tables.orders(spark, sfDir).createOrReplaceTempView("graft_ord_sq")
    spark.sql(
      """SELECT c_custkey, c_acctbal,
        |  (SELECT count(*) FROM graft_ord_sq o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM graft_cust_sq c
        |WHERE EXISTS (SELECT 1 FROM graft_ord_sq o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey
        |""".stripMargin)
  }

  /** Fuzzy entity matching (q145): the blocked edit-distance join every
    * entity-resolution / record-linkage pipeline runs. A deterministic
    * "dirty" copy of each customer name is derived in-query (one digit of
    * the 9-digit suffix substituted, position and replacement md5-chosen
    * — the q101 eval-set stand-in pattern, since the fixtures carry no
    * naturally dirty names), then matched back against the clean table:
    * equi-join on a BLOCKING key (the untouched last-3-digit suffix — the
    * perturbed position is always in the first six) + codegen'd
    * `levenshtein ≤ 1` residual, best match per dirty row by (distance,
    * id). The blocking key caps comparisons at n²/1000 instead of n² —
    * the standard ER blocking bound; at larger corpora the key widens
    * (more suffix digits ⇒ finer blocks), the shape is unchanged. The
    * width is a real knob (`graft.scale.fuzzy.blockWidth`, default 3):
    * output is width-invariant wherever the key stays blocking-valid —
    * ScaleEscalationSpec pins widths 1..3 emit identical rows (a coarser
    * key is a strict candidate superset and the levenshtein residual is
    * exact). 3 is the fixture perturbation model's FULL stable suffix
    * (positions 1–6 may be edited), so the knob caps there; production
    * data widens past 3 by choosing keys from ITS stable fields. Real
    * collisions occur (dist-0 matches to a DIFFERENT customer whose name
    * IS the dirty string — 2267 of 15000 at sf0.1), so the tie-break
    * discipline is genuinely exercised. Emit (dirty_id, match_id, dist);
    * order by dirty_id.
    */
  def q145_fuzzy_match(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Escalation
    val bw = Escalation.confInt(spark, Escalation.FuzzyBlockWidthKey, 3)
    require(bw >= 1 && bw <= 3,
      s"${Escalation.FuzzyBlockWidthKey}=$bw outside [1,3] — the fixture " +
        "perturbation edits suffix positions 1-6, so only the last 3 " +
        "digits are blocking-valid; wider keys would drop true matches")
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val hash = md5(col("id").cast("string"))
    val d = c.select(col("id"),
      (conv(substring(hash, 1, 8), 16, 10).cast("long") % 6).as("p"),
      (conv(substring(hash, 9, 8), 16, 10).cast("long") % 9).as("off"),
      expr("substring(name, 10, 9)").as("sfx"))
    val dirty = d.select(
      col("id").as("dirty_id"),
      concat(lit("Customer#"),
        expr("substring(sfx, 1, int(p))"),
        expr("cast((cast(substring(sfx, int(p) + 1, 1) as bigint)" +
          " + 1 + off) % 10 as string)"),
        expr("substring(sfx, int(p) + 2)")).as("dname"),
      expr(s"substring(sfx, ${10 - bw}, $bw)").as("blk"))
    val clean = c.withColumn("blk", expr(s"substring(name, ${19 - bw}, $bw)"))
    val w = Window.partitionBy(col("dirty_id"))
      .orderBy(col("dist"), col("id"))
    // The clean side is ~5 MB at sf1, so Spark broadcasts it and the
    // quadratic levenshtein probe executes in the DIRTY side's scan
    // stage — one sub-8-MiB split = one task at any core count (the
    // q91 pathology, BASELINE §4.0c; measured 85 s single-task at sf1).
    // spreadIfNarrow parallelizes exactly that regime and is the
    // identity on a real corpus. Output-safe: the best-match window and
    // the final order are keyed by dirty_id.
    Escalation.spreadIfNarrow(dirty).join(clean, Seq("blk"))
      .withColumn("dist", levenshtein(col("dname"), col("name")))
      .filter(col("dist") <= 1)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("dirty_id"), col("id").as("match_id"),
        col("dist").cast("long").as("dist"))
      .orderBy(col("dirty_id"))
  }

  val oracle: Map[String, String] = Map(
    "q145_fuzzy_match" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS name FROM customer),
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
        |  SELECT dirty_id, match_id, CAST(dist AS BIGINT) AS dist,
        |         row_number() OVER (PARTITION BY dirty_id
        |                            ORDER BY dist, match_id) AS rn
        |  FROM cand)
        |SELECT dirty_id, match_id, dist FROM best WHERE rn = 1
        |ORDER BY dirty_id""".stripMargin,
    "q46_subquery" ->
      """SELECT c_custkey, c_acctbal,
        |  (SELECT count(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q10_join_inner" ->
      """SELECT o_orderkey, c_name, c_mktsegment, round(o_totalprice, 2) AS o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey LIMIT 1000""".stripMargin,
    "q11_join_multiway" ->
      """SELECT n_name,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |    AS DOUBLE), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q12_join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_p_orders
        |FROM customer
        |LEFT OUTER JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
        |  ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY n_p_orders DESC, c_custkey""".stripMargin,
    "q13_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 490000)
        |ORDER BY c_custkey""".stripMargin,
    "q14_join_anti" ->
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q15_join_theta" ->
      """SELECT p_brand, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN part
        |  ON l_partkey = p_partkey AND l_quantity > p_size
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q16_join_asof" ->
      """SELECT p.event_id,
        |  (SELECT s.event_id FROM events s
        |   WHERE s.user_id = p.user_id AND s.event_type = 'signup'
        |     AND (s.ts < p.ts OR (s.ts = p.ts AND s.event_id <= p.event_id))
        |   ORDER BY s.ts DESC, s.event_id DESC LIMIT 1) AS signup_event_id
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,
    "q17_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "q77_upsert_merge" ->
      """WITH upd AS (
        |  SELECT o_orderkey, o_totalprice + 10000.0 AS o_totalprice,
        |    o_orderstatus, 'u' AS op FROM orders WHERE o_orderkey % 100 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, o_orderstatus, 'd' FROM orders
        |  WHERE o_orderkey % 100 = 1
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus, 'u'
        |  FROM orders WHERE o_orderkey % 100 = 2),
        |merged AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd
        |  WHERE op = 'u')
        |SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS total
        |FROM merged ORDER BY o_orderkey""".stripMargin,
    "q19_join_asof_generic" ->
      """SELECT p.event_id, c.event_id AS click_event_id,
        |  round(c.value, 2) AS click_value
        |FROM events p
        |LEFT JOIN LATERAL (
        |  SELECT ce.event_id, ce.value FROM events ce
        |  WHERE ce.user_id = p.user_id AND ce.event_type = 'click'
        |    AND ce.ts <= p.ts
        |  ORDER BY ce.ts DESC, ce.event_id DESC LIMIT 1) c ON true
        |WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,
    "q18_join_full_outer" ->
      """SELECT coalesce(a.c_custkey, b.o_custkey) AS custkey,
        |  a.neg_bal, b.n_big
        |FROM (SELECT c_custkey, round(c_acctbal, 2) AS neg_bal
        |      FROM customer WHERE c_acctbal < 0) a
        |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_big
        |      FROM orders WHERE o_totalprice > 490000 GROUP BY o_custkey) b
        |  ON a.c_custkey = b.o_custkey
        |ORDER BY custkey""".stripMargin,
  )
}

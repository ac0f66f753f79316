package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.2.A — scans, projection, filter, sort, limit.
  *
  * The reference's SoQL `$select/$where/$order/$limit` surface
  * (SURVEY.md §2.1, /root/reference/README.md:1 tombstone — SoQL is the
  * published Socrata API the client delegated queries to). All narrow ops:
  * filters and projections reach the parquet scan (predicate pushdown +
  * column pruning are Catalyst built-ins), top-k compiles to
  * TakeOrderedAndProject (no global sort at scale).
  */
object CoreQueries {

  def q01_scan_project(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        Det.r2(col("l_quantity")).as("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .limit(100)

  def q02_filter_where(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(
        col("l_shipdate").between(
          to_timestamp(lit("1996-01-01 00:00:00")),
          to_timestamp(lit("1996-12-31 00:00:00"))) &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24 &&
        col("l_returnflag").isin("A", "R") &&
        col("l_linestatus").like("F%"))
      .select(col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  def q03_project_arith(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        Det.r2(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax"))).as("charge"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("charge"))
      .limit(500)

  def q04_sort_multi(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .orderBy(col("o_orderpriority").desc, col("o_orderdate").asc,
        col("o_orderkey").asc)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"),
        Det.r2(col("o_totalprice")).as("o_totalprice"))
      .limit(200)

  def q05_topk_global(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select(col("o_orderkey"),
        Det.r2(col("o_totalprice")).as("o_totalprice"))
      .limit(50)

  /** Per-key top-k through the custom [[graft.plans.TopKPerKey]] operator
    * (partial/final bounded heaps, no Window, no sort, keys×k-bounded
    * shuffle) — the declared, driver-hash-checked exercise of the
    * extension ladder's whole-operator rung. Total order (price desc,
    * orderkey asc) makes boundary ties deterministic; the oracle is the
    * classic row_number formulation the operator replaces.
    */
  def q128_topk_per_key(spark: SparkSession, sfDir: String): DataFrame =
    graft.plans.TopK.perKey(Tables.orders(spark, sfDir), Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .select(col("o_orderkey"), col("o_custkey"),
        Det.r2(col("o_totalprice")).as("o_totalprice"))
      .orderBy(col("o_custkey"), col("o_orderkey"))

  val oracle: Map[String, String] = Map(
    "q128_topk_per_key" ->
      """WITH r AS (SELECT o_orderkey, o_custkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        |FROM r WHERE rn <= 3
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q01_scan_project" ->
      """SELECT l_orderkey, l_linenumber, round(l_quantity, 2) AS l_quantity
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 100""".stripMargin,
    "q02_filter_where" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24
        |  AND l_returnflag IN ('A', 'R')
        |  AND l_linestatus LIKE 'F%'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_project_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax), 2) AS charge
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, charge LIMIT 500""".stripMargin,
    "q04_sort_multi" ->
      """SELECT o_orderkey, o_orderpriority, o_orderdate,
        |  round(o_totalprice, 2) AS o_totalprice
        |FROM orders
        |ORDER BY o_orderpriority DESC, o_orderdate ASC, o_orderkey ASC
        |LIMIT 200""".stripMargin,
    "q05_topk_global" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50""".stripMargin,
  )
}

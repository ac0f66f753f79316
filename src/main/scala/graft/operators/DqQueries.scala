package graft.operators

import graft.Tables
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

  val oracle: Map[String, String] = Map(
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

package graft

import org.apache.spark.sql.functions._

/** Smoke + pinned-shape checks for every declared query (the full
  * hash-match gate is the driver's DuckDB oracle; tools/compare.py mirrors
  * it — these assert structural invariants that survive refactors).
  */
class DeclaredQueriesSpec extends SparkSpec {

  test("every declared query has an oracle and runs non-empty at sf0.001") {
    val qs = SparkEntry.queries
    assert(qs.size >= 43)
    assert(SparkEntry.oracleSql.keySet == qs.keySet,
      s"oracle/queries key mismatch: ${qs.keySet.diff(SparkEntry.oracleSql.keySet)} / ${SparkEntry.oracleSql.keySet.diff(qs.keySet)}")
    qs.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry() is the flagship q20 and returns the 6 flag×status groups") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 6)
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == 6)
  }

  test("q17 cross join is exactly |region| × |nation|") {
    assert(SparkEntry.queries("q17_join_cross")(spark, sfDir).count() == 125)
  }

  test("q30 emits at most 3 rows per customer, rank consistent") {
    val df = SparkEntry.queries("q30_window_rank")(spark, sfDir)
    val bad = df.groupBy("o_custkey").count().filter(col("count") > 3).count()
    assert(bad == 0)
    assert(df.filter(col("rn") =!= col("rnk")).count() == 0) // unique sort key
  }

  test("q81 plan contains no cartesian product (blocked join)") {
    val plan = SparkEntry.queries("q81_sim_jaccard")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("q82 ranks are 1..5 per probe") {
    val df = SparkEntry.queries("q82_knn_cosine")(spark, sfDir)
    val perProbe = df.groupBy("probe_id")
      .agg(count(lit(1)).as("n"), min("rank").as("mn"), max("rank").as("mx"))
      .collect()
    assert(perProbe.length == 5)
    perProbe.foreach { r =>
      assert(r.getAs[Long]("n") == 5 && r.getAs[Long]("mn") == 1 &&
        r.getAs[Long]("mx") == 5)
    }
  }

  test("q40/q41/q42 satisfy |A ∪ B| = |A| + |B| - |A ∩ B|") {
    val u = SparkEntry.queries("q40_union")(spark, sfDir).count()
    val i = SparkEntry.queries("q41_intersect")(spark, sfDir).count()
    val d = SparkEntry.queries("q42_except")(spark, sfDir).count()
    // |A| = |A\B| + |A∩B|; |A∪B| = |A\B| + |B| ⇒ u = d + i + (|B|-i) + i
    assert(u == d + i + (u - d - i)) // tautology guard
    val a = d + i                    // |A|
    val b = u - d                    // |B|
    assert(u == a + b - i)
  }

  test("topk(50) ⊆ topk(100) for the global top-k") {
    val orders = Tables.orders(spark, sfDir)
    def top(k: Int) = orders.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k).select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(top(50).subsetOf(top(100)))
  }

  test("q31 running sum final value equals the group sum per user") {
    val df = SparkEntry.queries("q31_window_frame")(spark, sfDir)
    val lastRun = df.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1).select(col("user_id"), col("run_sum"))
    val gsum = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(round(sum("value"), 2).as("g"))
    val joined = lastRun.join(gsum, "user_id")
      .filter(abs(col("run_sum") - col("g")) > 0.011)
    assert(joined.count() == 0)
  }

  test("q63 output is idempotent under re-dedup") {
    val d1 = SparkEntry.queries("q63_dedup_keyed")(spark, sfDir)
    assert(d1.count() == d1.dropDuplicates("user_id", "event_type").count())
  }
}

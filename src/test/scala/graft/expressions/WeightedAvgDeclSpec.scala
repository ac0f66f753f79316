package graft.expressions

import graft.{Det, SparkSpec, Tables}
import org.apache.spark.sql.functions._

class WeightedAvgDeclSpec extends SparkSpec {
  import spark.implicits._

  test("equals the typed Aggregator and the built-in sum(x*w)/sum(w) on the fixtures") {
    val li = Tables.lineitem(spark, sfDir)
    val decl = li.groupBy("l_returnflag")
      .agg(Det.r4(WeightedAvgDecl.weightedAvg(
        col("l_extendedprice"), col("l_quantity"))).as("w"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val typed = graft.operators.UdxQueries
      .q71_udaf_weighted(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val builtin = li.groupBy("l_returnflag")
      .agg(Det.r4(sum(col("l_extendedprice") * col("l_quantity")) /
        sum(col("l_quantity"))).as("w"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(decl == typed)
    assert(decl == builtin)
  }

  test("plans two-phase like built-in aggregates (partial + final)") {
    val p = Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(WeightedAvgDecl.weightedAvg(col("l_extendedprice"), col("l_quantity")))
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(1200))
  }

  test("null weights are skipped; empty group yields NaN") {
    val df = Seq((Some(1.0), Some(2.0)), (Some(5.0), None),
      (None, Some(9.0))).toDF("x", "w")
    val r = df.agg(WeightedAvgDecl.weightedAvg(col("x"), col("w")))
      .head().getDouble(0)
    assert(r == 1.0)   // only (1.0, 2.0) contributes: 2/2
    val nan = Seq((Option.empty[Double], Option.empty[Double])).toDF("x", "w")
      .agg(WeightedAvgDecl.weightedAvg(col("x"), col("w"))).head().getDouble(0)
    assert(nan.isNaN)
  }

  test("integer/long inputs coerce to double like built-in sum/avg") {
    // pre-round-4 this failed analysis: checkInputDataTypes demanded
    // exactly (double, double); ImplicitCastInputTypes now inserts casts
    val df = Seq((1, 2L), (3, 4L)).toDF("x", "w")
    val r = df.agg(WeightedAvgDecl.weightedAvg(col("x"), col("w")))
      .head().getDouble(0)
    assert(r == (1.0 * 2 + 3.0 * 4) / 6)
    graft.plans.GraftExtensions.register(spark)
    df.createOrReplaceTempView("graft_wa_int")
    val viaSql = spark.sql(
      "SELECT weighted_avg(x, w) FROM graft_wa_int").head().getDouble(0)
    assert(viaSql == r)
  }

  test("SQL surface via GraftExtensions: weighted_avg callable in GROUP BY queries") {
    graft.plans.GraftExtensions.register(spark)
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("graft_li_wa")
    val viaSql = spark.sql(
      """SELECT l_returnflag, round(weighted_avg(l_extendedprice, l_quantity), 4) AS w
        |FROM graft_li_wa GROUP BY l_returnflag""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val viaCol = Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(Det.r4(WeightedAvgDecl.weightedAvg(
        col("l_extendedprice"), col("l_quantity"))).as("w"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(viaSql == viaCol)
  }
}

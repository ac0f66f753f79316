package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted aggregation equals the plain aggregation (hot key safe)") {
    val li = Tables.lineitem(spark, sfDir)
    val plain = li.groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 2).as("q"), sum(lit(1L)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSum(li, "l_returnflag", "l_orderkey", buckets = 8,
      Map("q" -> col("l_quantity"), "n" -> lit(1L)))
      .select(col("l_returnflag"), round(col("q"), 2).as("q"), col("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted join equals the plain join on a skewed key") {
    val li = Tables.lineitem(spark, sfDir)
    val part = Tables.part(spark, sfDir)
    val plain = li.join(part, li("l_partkey") === part("p_partkey"))
      .groupBy("p_brand").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(
        li.withColumnRenamed("l_partkey", "p_partkey"), part,
        "p_partkey", "l_orderkey", buckets = 4)
      .groupBy("p_brand").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  test("salt spreads a single hot key across buckets") {
    import spark.implicits._
    val hot = (0 until 1000).map(i => (1L, i.toLong)).toDF("key", "id")
    val spread = hot.select(Skew.salt(col("id"), 8).as("s"))
      .distinct().count()
    assert(spread == 8)
  }
}

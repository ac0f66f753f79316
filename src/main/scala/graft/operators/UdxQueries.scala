package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** §2.2.H — the user-extension surface: scalar UDF, typed UDAF
  * (`Aggregator`), and generator (UDTF). The reference let users run
  * arbitrary Ruby blocks over fetched rows (SURVEY §2.1 Ruby:Enumerable);
  * here the same extension points are Spark-native.
  *
  * Note the preference order (SURVEY §7.3): q72 uses the built-in
  * `posexplode` Generator rather than a custom one — built-ins stay inside
  * codegen. q70's UDF is the one deliberate scalar UDF (the oracle proves
  * the same logic is CASE-expressible; a real pipeline would prefer the
  * CASE form, which Catalyst can push and fold).
  */
object UdxQueries {

  /** Quantity-weighted average: sum(w*x)/sum(w) as a typed Aggregator —
    * the deliberate exercise of the typed-UDAF surface (SURVEY §7.3).
    * Buffer is (sum_wx, sum_w); merge is associative+commutative so Spark
    * can combine partial buffers map-side before the shuffle.
    */
  class WeightedAvg extends Aggregator[Row, (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), r: Row): (Double, Double) = {
      val x = r.getDouble(0); val w = r.getDouble(1)
      (b._1 + x * w, b._2 + w)
    }
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) Double.NaN else b._1 / b._2
    override def bufferEncoder = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder = Encoders.scalaDouble
  }

  def q70_udf_scalar(spark: SparkSession, sfDir: String): DataFrame = {
    val discountBand = udf((d: Double) =>
      if (d < 0.03) "low" else if (d < 0.07) "mid" else "high")
    Tables.lineitem(spark, sfDir)
      .select(discountBand(col("l_discount")).as("band"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("band"))
  }

  def q71_udaf_weighted(spark: SparkSession, sfDir: String): DataFrame = {
    val wavg = udaf(new WeightedAvg,
      Encoders.row(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("w", org.apache.spark.sql.types.DoubleType)))))
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(Det.r4(wavg(col("l_extendedprice"), col("l_quantity")))
        .as("w_avg_price"))
      .orderBy(col("l_returnflag"))
  }

  def q72_udtf_explode(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 3)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
        Det.r6(col("col").cast("double")).as("val"))
      .orderBy(col("vec_id"), col("pos"))

  val oracle: Map[String, String] = Map(
    "q70_udf_scalar" ->
      """SELECT CASE WHEN l_discount < 0.03 THEN 'low'
        |            WHEN l_discount < 0.07 THEN 'mid'
        |            ELSE 'high' END AS band,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY band""".stripMargin,
    "q71_udaf_weighted" ->
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS w_avg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q72_udtf_explode" ->
      """SELECT vec_id,
        |  CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
        |  round(CAST(unnest(embedding) AS DOUBLE), 6) AS val
        |FROM embeddings WHERE vec_id < 3 ORDER BY vec_id, pos""".stripMargin,
  )
}

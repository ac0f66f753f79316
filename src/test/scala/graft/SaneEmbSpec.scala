package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins [[Det.saneEmb]]'s verdict per hostile-vector class — the gate
  * every similarity/assignment query (q82/q87/q98/q155/q158/q164/q200/
  * q227) applies so one corrupt export row degrades to "excluded and
  * countable via q197" instead of an ANSI DIVIDE_BY_ZERO/CAST_OVERFLOW
  * killing the job (round 7, from the adversarial fixture gate —
  * CORRECTNESS_adversarial_r07.txt).
  */
class SaneEmbSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("embedding",
      ArrayType(FloatType, containsNull = true), nullable = false)))

  private def verdicts(vecs: Seq[(String, Seq[java.lang.Float])])
      : Map[String, Boolean] = {
    val rows = vecs.map { case (n, v) => Row(n, v) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    df.select(col("name"), Det.saneEmb(col("embedding")).as("sane"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
  }

  private def f(x: Float): java.lang.Float = java.lang.Float.valueOf(x)

  test("saneEmb admits healthy vectors and rejects every hostile class") {
    val dims = 8
    val v = verdicts(Seq(
      "normal" -> Seq.fill(dims)(f(0.25f)),
      "negative" -> Seq.fill(dims)(f(-0.99f)),
      "boundary10" -> Seq.fill(dims)(f(10.0f)),
      "subnormal" -> Seq.fill(dims)(f(1.0e-40f)),
      "axis" -> (f(1.0f) +: Seq.fill(dims - 1)(f(0.0f))),
      "zero" -> Seq.fill(dims)(f(0.0f)),
      "big" -> Seq.fill(dims)(f(3.0e38f)),
      "over10" -> (f(10.5f) +: Seq.fill(dims - 1)(f(0.1f))),
      "nan" -> (f(Float.NaN) +: Seq.fill(dims - 1)(f(0.5f))),
      "posinf" -> (f(Float.PositiveInfinity) +: Seq.fill(dims - 1)(f(0.5f))),
      "neginf" -> (f(Float.NegativeInfinity) +: Seq.fill(dims - 1)(f(0.5f))),
      "nullelem" -> (null.asInstanceOf[java.lang.Float]
        +: Seq.fill(dims - 1)(f(0.5f)))))
    assert(v("normal"));  assert(v("negative"))
    assert(v("boundary10")); assert(v("subnormal")); assert(v("axis"))
    assert(!v("zero"), "zero-norm vector has no direction")
    assert(!v("big"), "micro-unit cast would overflow BIGINT")
    assert(!v("over10"))
    assert(!v("nan")); assert(!v("posinf")); assert(!v("neginf"))
    assert(!v("nullelem"), "a NULL element poisons every dot product")
  }

  test("q197 reports hostile components as n_bad instead of crashing") {
    // one clean corpus vector + the three component-corrupt classes:
    // dims 1-2 corrupt in each hostile vector, the rest healthy
    val rows = Seq(
      Row(1L, Seq(f(0.5f), f(-0.5f), f(0.25f)), 0),
      Row(2L, Seq(f(Float.NaN), f(Float.NaN), f(0.1f)), 1),
      Row(3L, Seq(null.asInstanceOf[java.lang.Float],
        null.asInstanceOf[java.lang.Float], f(0.2f)), 2),
      Row(4L, Seq(f(3.0e38f), f(11.0f), f(0.3f)), 3))
    val sch = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding",
        ArrayType(FloatType, containsNull = true), nullable = false),
      StructField("label", IntegerType, nullable = false)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), sch)
    val out = df
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .select((col("i") + 1).cast("long").as("dim"),
        col("x").cast("double").as("xd"))
      .withColumn("bad",
        col("xd").isNull || !(abs(col("xd")) <= lit(10.0)))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("bad"), 1L).otherwise(0L)).as("n_bad"))
      .orderBy(col("dim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 4L, 3L), (2L, 4L, 3L), (3L, 4L, 0L)))
  }
}

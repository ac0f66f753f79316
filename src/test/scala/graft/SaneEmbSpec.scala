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
    // drives the REAL declared query over a temp parquet fixture: one
    // clean corpus vector + the three component-corrupt classes, dims
    // 1-2 corrupt in each hostile vector, the rest healthy
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
    val dir = java.nio.file.Files
      .createTempDirectory("graft-saneemb").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows), sch)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q197_embed_health")(spark, dir)
      .select(col("dim"), col("n"), col("n_bad"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 4L, 3L), (2L, 4L, 3L), (3L, 4L, 0L)))
  }

  test("similarity queries exclude insane vectors via the gate") {
    // q82 over a fixture containing the zero vector, a NaN vector, and
    // an over-range vector: none may appear as probe or neighbor
    val dims = 4
    val rows = (0L to 6L).map { i =>
      Row(i, Seq.tabulate(dims)(d => f((i + 1).toFloat / (d + 7))), 0)
    } ++ Seq(
      Row(7L, Seq.fill(dims)(f(0.0f)), 0),
      Row(8L, f(Float.NaN) +: Seq.fill(dims - 1)(f(0.5f)), 0),
      Row(9L, Seq.fill(dims)(f(3.0e38f)), 0))
    val sch = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding",
        ArrayType(FloatType, containsNull = true), nullable = false),
      StructField("label", IntegerType, nullable = false)))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-saneemb-knn").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows), sch)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q82_knn_cosine")(spark, dir).collect()
    assert(out.nonEmpty)
    val ids = out.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(ids.intersect(Set(7L, 8L, 9L)).isEmpty,
      s"insane vectors leaked into the knn output: $ids")
  }
}

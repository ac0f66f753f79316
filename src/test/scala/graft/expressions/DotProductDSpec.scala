package graft.expressions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DotProductDSpec extends SparkSpec {
  import spark.implicits._

  test("matches the HOF formulation bit-for-bit on all fixture vectors") {
    val emb = Tables.embeddings(spark, sfDir).limit(200)
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val diff = emb.select(
        DotProductD.dot(col("embedding"), col("embedding")).as("cg"),
        hof.as("hof"))
      .filter(col("cg") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("handles empty arrays, nulls, and rejects wrong types") {
    val df = Seq((Some(Seq.empty[Float]), Some(Seq.empty[Float])),
      (None, Some(Seq(1.0f)))).toDF("a", "b")
    val r = df.select(DotProductD.dot(col("a"), col("b")).as("d")).collect()
    assert(r(0).getDouble(0) == 0.0)
    assert(r(1).isNullAt(0))
    intercept[Exception] {
      Seq((Seq(1L), Seq(1.0f))).toDF("a", "b")
        .select(DotProductD.dot(col("a"), col("b"))).collect()
    }
  }
}

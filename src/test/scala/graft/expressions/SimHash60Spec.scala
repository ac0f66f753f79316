package graft.expressions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimHash60Spec extends SparkSpec {
  import spark.implicits._

  test("expression equals the pure-SQL md5 formulation on every fixture doc") {
    // independent formulation: conv() the first 15 md5 hex chars per
    // distinct token, majority-vote each bit — all built-ins, no custom code
    val viaSql = Tables.documents(spark, sfDir).select(col("doc_id"),
      expr("""
        aggregate(
          sequence(0, 59),
          0L,
          (fp, b) -> fp + if(
            2 * aggregate(
              transform(array_distinct(split(text, ' ')),
                t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)),
              0,
              (ones, h) -> ones + int(shiftright(h, b) & 1)) >=
            size(array_distinct(split(text, ' '))),
            shiftleft(1L, b), 0L))
      """).as("fp_sql"))
    val viaExpr = Tables.documents(spark, sfDir).select(col("doc_id"),
      SimHash60.simhash60(col("text")).as("fp"))
    val diff = viaExpr.join(viaSql, "doc_id")
      .filter(col("fp") =!= col("fp_sql"))
    assert(diff.count() == 0, diff.take(3).mkString(";"))
  }

  test("identical texts get identical fingerprints; distance is a metric-ish sanity") {
    val fp = Seq("a b c d e", "a b c d e", "x y z w v")
      .toDF("text").select(SimHash60.simhash60(col("text")).as("fp"))
      .as[Long].collect()
    assert(fp(0) == fp(1))
    assert(java.lang.Long.bitCount(fp(0) ^ fp(2)) > 0)
  }

  test("fingerprint uses only 60 bits") {
    val bad = Tables.documents(spark, sfDir)
      .select(SimHash60.simhash60(col("text")).as("fp"))
      .filter(shiftright(col("fp"), 60) =!= 0L)
    assert(bad.count() == 0)
  }

  test("null yields null; non-string rejected") {
    val r = Seq[Option[String]](None).toDF("t")
      .select(SimHash60.simhash60(col("t"))).collect()
    assert(r.head.isNullAt(0))
    intercept[Exception] {
      Seq(1).toDF("x").select(SimHash60.simhash60(col("x"))).collect()
    }
  }
}

package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimHashSpec extends SparkSpec {
  import spark.implicits._

  test("identical texts get identical fingerprints; hamming 0") {
    val df = Seq(
      (1L, "scan filter join window sort"),
      (2L, "scan filter join window sort"),
      (3L, "completely different words entirely here")).toDF("id", "text")
    val fp = SimHash.withSimhash(df, "text").select("id", "simhash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("hamming distance is symmetric and zero on self") {
    val df = Seq((0x0FL, 0xF0L), (0xFFL, 0xFFL)).toDF("a", "b")
    val got = df.select(
      SimHash.hamming(col("a"), col("b")).as("ab"),
      SimHash.hamming(col("b"), col("a")).as("ba")).collect()
    assert(got(0).getInt(0) == 8 && got(0).getInt(0) == got(0).getInt(1))
    assert(got(1).getInt(0) == 0)
  }

  test("band16 decomposes the fingerprint") {
    val df = Seq(Tuple1(0x1234_5678_9ABC_DEF0L)).toDF("fp")
    val bands = df.select(
      SimHash.band16(col("fp"), 0).as("b0"), SimHash.band16(col("fp"), 1).as("b1"),
      SimHash.band16(col("fp"), 2).as("b2"), SimHash.band16(col("fp"), 3).as("b3"))
      .collect().head
    assert(bands.getLong(0) == 0xDEF0L && bands.getLong(1) == 0x9ABCL &&
      bands.getLong(2) == 0x5678L && bands.getLong(3) == 0x1234L)
  }

  test("near-dup pairs find exact twins (dist 0) and nothing above maxDist") {
    val base = Tables.documents(spark, sfDir).limit(10)
    val twin = base.withColumn("doc_id", col("doc_id") + 100000)
    val pairs = SimHash.nearDupPairs(base.union(twin), "doc_id", "text", maxDist = 3)
    assert(pairs.filter(col("id_b") === col("id_a") + 100000 &&
      col("dist") === 0).count() == 10)
    assert(pairs.filter(col("dist") > 3).count() == 0)
  }
}

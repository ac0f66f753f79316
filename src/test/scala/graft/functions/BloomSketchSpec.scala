package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSketchSpec extends SparkSpec {

  import spark.implicits._

  private val keys = (0 until 2000).map(i => s"key_$i")
  private val (m, k) = BloomSketch.sizing(2000, 0.01)

  private def build(df: org.apache.spark.sql.DataFrame): Array[Byte] =
    df.agg(BloomSketch.sketch(col("key"), m, k).as("f"))
      .head().getAs[Array[Byte]]("f")

  test("no false negatives, ever") {
    val f = build(keys.toDF("key"))
    assert(keys.forall(BloomSketch.mightContain(f, m, k, _)))
  }

  test("false-positive rate stays near the sized target") {
    val f = build(keys.toDF("key"))
    val absent = (0 until 10000).map(i => s"absent_$i")
    val fp = absent.count(BloomSketch.mightContain(f, m, k, _))
    // sized for 1%; allow generous slack for hash variance
    assert(fp < 300, s"fp=$fp of 10000 — far above the 1% design point")
  }

  test("filter bytes are identical under any partition layout") {
    val df = keys.toDF("key")
    val base = build(df)
    assert(java.util.Arrays.equals(base, build(df.repartition(32))))
    assert(java.util.Arrays.equals(base,
      build(df.repartition(7, col("key")))))
    assert(java.util.Arrays.equals(base, build(df.coalesce(1))))
    // idempotent under duplicate inserts too
    assert(java.util.Arrays.equals(base, build(df.union(df))))
  }

  test("bloom pre-filter keeps every true member of the authoritative set") {
    // the 100 TB shape: filter built over the seen-side, probed on the
    // incoming side; survivors go to the exact join — the filter may pass
    // extras (false positives) but must never drop a real member
    val seen = (0 until 1000 by 2).map(i => s"key_$i") // evens
    val f = build(seen.toDF("key"))
    val incoming = (0 until 1000).map(i => s"key_$i")
    val survivors = incoming.filter(BloomSketch.mightContain(f, m, k, _))
    assert(seen.forall(survivors.contains(_)))
  }

  test("column-side probe expression agrees with the driver-side probe") {
    val f = build(keys.toDF("key"))
    val probes = (0 until 500).map(i => s"key_${i * 7}") ++
      (0 until 500).map(i => s"absent_$i")
    val got = probes.toDF("key")
      .withColumn("hit", graft.expressions.BloomMightContain.mightContain(
        lit(f), col("key"), m, k))
      .select("key", "hit").as[(String, Boolean)].collect().toMap
    probes.foreach { p =>
      assert(got(p) == BloomSketch.mightContain(f, m, k, p), p)
    }
  }

  test("bloom pre-filter runs as a plan: broadcast bytes, scan-speed probe") {
    graft.plans.GraftExtensions.register(spark)
    val seenDf = (0 until 1000 by 2).map(i => s"key_$i").toDF("key")
    val incoming = (0 until 1000).map(i => s"key_$i").toDF("key")
    val filterBytes = build(seenDf)
    val survivors = incoming
      .filter(graft.expressions.BloomMightContain.mightContain(
        lit(filterBytes), col("key"), m, k))
    // every true member survives; the probe is a scan-side Filter (no
    // join, no shuffle before it)
    assert(survivors.count() >= 500)
    val plan = survivors.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
    // SQL surface drives the same expression
    incoming.createOrReplaceTempView("bloom_incoming")
    val hex = filterBytes.map("%02X".format(_)).mkString
    val viaSql = spark.sql("SELECT * FROM bloom_incoming " +
      s"WHERE bloom_might_contain(X'$hex', key, $m, $k)").count()
    assert(viaSql == survivors.count())
  }

  test("sizing follows the textbook optimum") {
    val (m1, k1) = BloomSketch.sizing(1000, 0.01)
    assert(m1 >= 9000 && m1 <= 10000, s"m=$m1") // ~9585 bits
    assert(k1 >= 6 && k1 <= 8, s"k=$k1")        // ~6.6 hashes
    intercept[IllegalArgumentException](BloomSketch.sizing(0, 0.01))
    intercept[IllegalArgumentException](BloomSketch.sizing(10, 1.5))
    // silent Int saturation would hand back a filter with ~37% FPR
    intercept[IllegalArgumentException](
      BloomSketch.sizing(1000000000L, 0.01))
  }

  test("probe fails loudly on a build/probe sizing mismatch") {
    val f = build(keys.toDF("key"))
    intercept[IllegalArgumentException] {
      BloomSketch.mightContain(f, numBits = m * 64, numHashes = k, "x")
    }
    intercept[IllegalArgumentException] {
      graft.expressions.BloomMightContain(
        org.apache.spark.sql.GraftColumn.expr(lit(f)),
        org.apache.spark.sql.GraftColumn.expr(lit("x")), 4, 1)
    }
  }
}

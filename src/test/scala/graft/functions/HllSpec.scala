package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HyperLogLog registers: error inside the published rsd band at several
  * cardinalities, linear-counting exactness at tiny range, element-wise-max
  * merge == one-pass sketch (byte-identical), and byte-identical registers
  * under 1/4/32 partition layouts — the storable/shippable guarantee the
  * built-in `approx_count_distinct` cannot give.
  */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private val P = 12
  private val m = 1 << P
  // 1.04/sqrt(m) ≈ 1.6%; test at 4 sigma to keep the deterministic
  // fixture from flaking while still rejecting a broken estimator
  private val tol = 4.0 * 1.04 / math.sqrt(m.toDouble)

  private def regs(df: org.apache.spark.sql.DataFrame): Array[Byte] =
    df.agg(Hll.sketch(col("v"), P).as("s")).collect()(0).getAs[Array[Byte]]("s")

  test("estimate within the rsd band across 1e3 / 1e4 / 1e5 distincts " +
    "(duplicates do not move the registers)") {
    for (n <- Seq(1000, 10000, 100000)) {
      val df = spark.range(n.toLong).select(concat(lit("k"),
        col("id").cast("string")).as("v"))
      val est = Hll.estimate(regs(df))
      assert(math.abs(est - n).toDouble / n <= tol, s"n=$n est=$est")
      // tripled input = same distinct set = identical registers
      val tripled = df.union(df).union(df)
      assert(java.util.Arrays.equals(regs(df), regs(tripled)))
    }
  }

  test("tiny cardinalities hit the linear-counting path and land exact") {
    for (n <- Seq(1, 7, 50)) {
      val df = spark.range(n.toLong).select(col("id").cast("string").as("v"))
      assert(Hll.estimate(regs(df)) == n.toLong, s"n=$n")
    }
  }

  test("merge of disjoint half-sketches is byte-identical to the one-pass " +
    "sketch of the union") {
    val all = spark.range(20000L).select(col("id").cast("string").as("v"))
    val lo = all.filter(col("v").cast("long") < 10000L)
    val hi = all.filter(col("v").cast("long") >= 10000L)
    val h = new Hll(P)
    val merged = h.merge(regs(lo), regs(hi))
    assert(java.util.Arrays.equals(merged, regs(all)))
  }

  test("registers are byte-identical under 1/4/32 partition layouts") {
    val base = spark.range(30000L).select(concat(lit("x"),
      col("id").cast("string")).as("v"))
    val r1 = regs(base.repartition(1))
    val r4 = regs(base.repartition(4))
    val r32 = regs(base.repartition(32))
    assert(java.util.Arrays.equals(r1, r4))
    assert(java.util.Arrays.equals(r1, r32))
  }

  test("nulls are ignored; all-null input estimates zero") {
    val df = spark.range(100L).select(
      when(col("id") % 2 === 0, col("id").cast("string")).as("v"))
    val est = Hll.estimate(regs(df))
    assert(math.abs(est - 50L) <= 2, s"est=$est")
    val nulls = spark.range(10L).select(lit(null).cast("string").as("v"))
    assert(Hll.estimate(regs(nulls)) == 0L)
  }

  test("grouped sketches: per-group registers match per-group " +
    "single-partition reference") {
    val df = spark.range(5000L).select((col("id") % 3).as("g"),
      col("id").cast("string").as("v"))
    val grouped = df.groupBy(col("g")).agg(Hll.sketch(col("v"), P).as("s"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("s")).toMap
    for (g <- 0L to 2L) {
      val ref = regs(df.filter(col("g") === g).select(col("v")).repartition(1))
      assert(java.util.Arrays.equals(grouped(g), ref), s"group $g")
      val n = df.filter(col("g") === g).count()
      val est = Hll.estimate(grouped(g))
      assert(math.abs(est - n).toDouble / n <= tol, s"group $g est=$est")
    }
  }
}

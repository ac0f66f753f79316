package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)

  test("hashSample rate is honored within 4-hex resolution at corpus scale") {
    val n = docs.count().toDouble
    Seq(0.1, 0.25, 0.5, 0.9).foreach { rate =>
      val kept = docs.filter(Sampling.hashSample(col("doc_id"), rate)).count()
      // md5 uniformity: expect rate·n ± 5·sqrt(n) (≈5σ binomial bound)
      val tol = 5.0 * math.sqrt(n)
      assert(math.abs(kept - rate * n) <= tol,
        s"rate=$rate kept=$kept of $n")
    }
    assert(docs.filter(Sampling.hashSample(col("doc_id"), 1.0)).count() == n)
    assert(docs.filter(Sampling.hashSample(col("doc_id"), 0.0)).count() == 0)
  }

  test("membership is a pure function of the key: layout- and growth-stable") {
    val sample = docs.filter(Sampling.hashSample(col("doc_id"), 0.3))
      .select("doc_id").as[Long].collect().toSet
    // repartition must not change membership (rand-based samplers fail this)
    val repart = docs.repartition(13, col("lang"))
      .filter(Sampling.hashSample(col("doc_id"), 0.3))
      .select("doc_id").as[Long].collect().toSet
    assert(repart == sample)
    // a doc's membership is unchanged when the corpus shrinks/grows
    val half = docs.filter(col("doc_id") % 2 === 0)
      .filter(Sampling.hashSample(col("doc_id"), 0.3))
      .select("doc_id").as[Long].collect().toSet
    assert(half == sample.filter(_ % 2 == 0))
  }

  test("hashSplit partitions every key into exactly one of train/val/test") {
    val out = docs.select(col("doc_id"),
      Sampling.hashSplit(col("doc_id"), 0.9, 0.05).as("split"))
    assert(out.count() == docs.count())
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    // 90/5/5 within binomial noise on 500 docs
    assert(counts("train") > 400 && counts("val") < 60 && counts("test") < 60)
    // nested property: the train set at (0.9, .05) contains the train set
    // at (0.5, .05) — thresholds are prefixes of the same hash order
    val small = docs.filter(
      Sampling.hashSplit(col("doc_id"), 0.5, 0.05) === "train")
      .select("doc_id").as[Long].collect().toSet
    val big = docs.filter(
      Sampling.hashSplit(col("doc_id"), 0.9, 0.05) === "train")
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("hashSplit boundary: fractions summing to 1.0 leave test empty, not val") {
    // regression (round-4 advice): cumulative 0.8+0.2 rounds to 65536 units,
    // whose 4-hex format overflows to the 5-char "10000" — lexicographically
    // below every hash, silently emptying 'val'. The boundary must saturate.
    val out = docs.select(col("doc_id"),
      Sampling.hashSplit(col("doc_id"), 0.8, 0.2).as("split"))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count()
    assert(!counts.contains("test"), s"test bucket must be empty: $counts")
    assert(counts.getOrElse("val", 0L) > 0L, s"val bucket vanished: $counts")
    assert(counts.values.sum == n)
    // ~80/20 within 5σ binomial noise
    assert(math.abs(counts("train") - 0.8 * n) <= 5 * math.sqrt(n.toDouble))
  }

  test("hashSample saturates for rates that round to 65536/65536") {
    val n = docs.count()
    // 0.999999 rounds to 65536 units but is < 1.0 — must keep everything
    assert(docs.filter(Sampling.hashSample(col("doc_id"), 0.999999)).count() == n)
    val kept = spark.sql(
      s"SELECT count(*) FROM (SELECT 1 FROM range(100) WHERE ${Sampling.hashSampleSql("id", 0.999999)})")
      .collect()(0).getLong(0)
    assert(kept == 100L)
  }

  test("recipeSample applies the per-stratum rate and the default elsewhere") {
    val rates = Map("src0" -> 1.0, "src1" -> 0.0)
    val kept = docs.filter(
      Sampling.recipeSample(col("source"), col("doc_id"), rates,
        defaultRate = 0.5))
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 25)            // rate 1.0: all 25 docs
    assert(!bySrc.contains("src1"))        // rate 0.0: none
    // every other source sampled at the 0.5 default — and identical to a
    // direct hashSample of the same keys (recipe adds nothing but routing)
    val direct = docs.filter(col("source") =!= "src0" &&
        col("source") =!= "src1")
      .filter(Sampling.hashSample(col("doc_id"), 0.5))
      .select("doc_id").as[Long].collect().toSet
    val routed = kept.filter(col("source") =!= "src0")
      .select("doc_id").as[Long].collect().toSet
    assert(routed == direct)
  }

  test("SQL registry: hash_sample / hash_split / scrub_pii usable from $where strings") {
    graft.plans.GraftExtensions.register(spark)
    docs.createOrReplaceTempView("sampling_docs")
    val viaSql = spark.sql(
      "SELECT doc_id FROM sampling_docs WHERE hash_sample(doc_id, 0.3)")
      .as[Long].collect().toSet
    val viaCol = docs.filter(Sampling.hashSample(col("doc_id"), 0.3))
      .select("doc_id").as[Long].collect().toSet
    assert(viaSql == viaCol)
    val splitSql = spark.sql(
      "SELECT doc_id, hash_split(doc_id, 0.9, 0.05) AS s FROM sampling_docs")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val splitCol = docs.select(col("doc_id"),
      Sampling.hashSplit(col("doc_id"), 0.9, 0.05).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(splitSql == splitCol)
    assert(spark.sql(
      "SELECT scrub_pii('mail a@b.co now') AS t").first().getString(0) ==
      "mail [EMAIL] now")
  }

  test("hashSampleSql mirrors hashSample's predicate text") {
    assert(Sampling.hashSampleSql("doc_id", 1.0) == "true")
    assert(Sampling.hashSampleSql("doc_id", 0.0) == "false")
    assert(Sampling.hashSampleSql("doc_id", 0.5) ==
      "substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000'")
  }
}

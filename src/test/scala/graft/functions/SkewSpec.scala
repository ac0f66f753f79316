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

  test("stress: genuinely skewed corpus (one key = 50% of rows) — salted " +
    "agg exact, hot key spread evenly over salt buckets") {
    import spark.implicits._
    // 100k rows: key "hot" holds 50%, the rest spread over 50 cold keys
    val n = 100000
    val skewed = (0 until n).map { i =>
      val key = if (i % 2 == 0) "hot" else s"cold_${i % 50}"
      (key, i.toLong, (i % 97).toLong)
    }.toDF("key", "id", "v").repartition(32)
    val buckets = 8

    // correctness: salted two-phase agg must equal the plain agg EXACTLY
    // (long sums — no float reassociation questions)
    val plain = skewed.groupBy("key")
      .agg(sum("v").as("sv"), sum(lit(1L)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedSum(skewed, "key", "id", buckets,
      Map("sv" -> col("v"), "n" -> lit(1L)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)

    // scale property: phase-1 fan-out splits the hot key's 50k rows into
    // `buckets` groups of ≈ 1/buckets each — no reducer sees the full key
    val hotPerSalt = skewed.filter(col("key") === "hot")
      .groupBy(Skew.salt(col("id"), buckets).as("s"))
      .count().collect().map(_.getLong(1))
    assert(hotPerSalt.length == buckets, "hot key missing from some salt bucket")
    val hotTotal = hotPerSalt.sum
    assert(hotTotal == n / 2)
    val ideal = hotTotal.toDouble / buckets
    assert(hotPerSalt.max <= ideal * 1.2,
      s"max salt bucket ${hotPerSalt.max} vs ideal $ideal — salt not spreading")
    assert(hotPerSalt.min >= ideal * 0.8,
      s"min salt bucket ${hotPerSalt.min} vs ideal $ideal — salt not spreading")
  }

  test("AQE splits a skewed sort-merge join at runtime (the built-in complement to salting)") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // shrink the skew thresholds so fixture-scale data trips the
      // optimizer; disable broadcast so the join actually sort-merges
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // one hot key with 60k fat rows vs 40 cold keys
      val left = (0 until 66000).map { i =>
        (if (i % 11 == 0) (i % 40) + 1L else 0L, i.toLong, "x" * 64)
      }.toDF("k", "id", "pad")
      val right = (0L until 41L).map(k => (k, s"dim_$k")).toDF("k", "name")
      val joined = left.join(right, "k")
      // collect() executes THIS dataset's QueryExecution (count()/foreach
      // plan their own and would leave joined's adaptive plan unfinalized)
      assert(joined.collect().length == 66000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE skew handling did not activate:\n${finalPlan.take(1800)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("salt spreads a single hot key across buckets") {
    import spark.implicits._
    val hot = (0 until 1000).map(i => (1L, i.toLong)).toDF("key", "id")
    val spread = hot.select(Skew.salt(col("id"), 8).as("s"))
      .distinct().count()
    assert(spread == 8)
  }
}

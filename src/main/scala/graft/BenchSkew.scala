package graft

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Skewed-corpus bench tier: the sf fixtures are uniform, so the bucket
  * caps and salting guards never show up in BENCH numbers — this main
  * synthesizes a deterministic HOT corpus at sf0.1 scale (half the docs
  * are near-copies of one template: the exact-dup-heavy shape that is the
  * norm in web-scale corpora) and times the dedup tier on it.
  *
  * The point being measured: q85/q94/q96's bucket caps bound the hot
  * cluster's candidate pairs (an uncapped band join would generate
  * ~(hot·bands)²/2 pairs from the template cluster alone), so the skewed
  * timings should sit in the same range as the uniform-corpus timings in
  * BENCH_r{N}, not blow up quadratically.
  *
  * Output: one JSON line, same shape as [[Bench]], metric "total_skew".
  * Corpus knobs via env: SPARK_GRAFT_SKEW_N (docs, default 5000 = sf0.1),
  * SPARK_GRAFT_SKEW_HOT (hot fraction, default 0.5).
  */
object BenchSkew {

  /** Deterministic skewed documents table written under `dir` with the
    * fixture schema (doc_id, text, lang, source, n_chars). Seeded PRNG —
    * identical corpus every run.
    */
  def writeSkewedDocs(spark: SparkSession, dir: String, n: Int,
                      hotFrac: Double): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Array.tabulate(800)(i => s"w$i")
    val langs = Array("en", "en", "en", "zh", "es", "fr", "de")
    val sources = Array("web", "wiki", "news", "books")
    val template = Array.fill(40)(vocab(rnd.nextInt(vocab.length)))
    val nHot = (n * hotFrac).toInt
    val rows = (0 until n).map { i =>
      val text =
        if (i < nHot) {
          // near-copy: one token substituted — Jaccard vs template ≈ 0.95,
          // so every hot doc lands in the same LSH/SimHash buckets
          val t = template.clone()
          t(rnd.nextInt(t.length)) = vocab(rnd.nextInt(vocab.length))
          t.mkString(" ")
        } else {
          Array.fill(30 + rnd.nextInt(31))(vocab(rnd.nextInt(vocab.length)))
            .mkString(" ")
        }
      (i.toLong, text, langs(i % langs.length), sources(i % sources.length),
        text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(8)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
  }

  /** Deterministic skewed event log under `dir` (raw fixture schema, ts
    * as int64 nanos): user 1 holds `hotFrac` of all events — the one-key
    * concentration AQE's skew split handles on shuffle joins and that
    * [[graft.operators.RangeJoin]]'s (key, bin) bucketing must keep
    * bounded (q129's join key includes the bin, so even the hot user's
    * probes spread across day bins instead of one monster partition).
    */
  def writeSkewedEvents(spark: SparkSession, dir: String, n: Int,
                        hotFrac: Double): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val types = Array("purchase", "click", "view", "error", "signup")
    val nHot = (n * hotFrac).toInt
    val base = 1735689600L * 1000000000L // 2025-01-01 UTC
    val span = 14L * 86400L * 1000000000L
    val rows = (0 until n).map { i =>
      val user = if (i < nHot) 1L else 2L + rnd.nextInt(math.max(1, n / 200))
      val tsNs = base + math.floorMod(rnd.nextLong(), span)
      (i.toLong, tsNs, user, types(rnd.nextInt(types.length)),
        rnd.nextDouble() * 500.0, """{"k":1}""")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(8)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
  }

  private val skewQueries = Seq("q80_dedup_exact", "q85_dedup_minhash_lsh",
    "q94_dedup_lsh_lang", "q96_dedup_simhash", "q97_curation_pipeline",
    "q100_dedup_components",
    // every skew-corpus text begins with the same first character (the
    // vocab is "w<i>") — under q115's old first-character blocking the
    // whole distinct corpus was ONE window task; the range-partitioned
    // rework must keep this flat
    "q115_dedup_prefix")

  /** Event-tier skew targets: the binned range join (the measured claim:
    * (key, bin) bucketing keeps the hot user's candidate pairs linear in
    * its events-per-day, not quadratic in its total events), plus the
    * per-user window queries whose hot-key cost is INHERENT (a window
    * partition cannot split — the number to watch, not to fix). */
  private val skewEventQueries =
    Seq("q129_interval_join", "q131_sessionize", "q146_interval_overlap")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val n = sys.env.getOrElse("SPARK_GRAFT_SKEW_N", "5000").toInt
    val hotFrac = sys.env.getOrElse("SPARK_GRAFT_SKEW_HOT", "0.5").toDouble
    val dir = sys.env.getOrElse("SPARK_GRAFT_SKEW_DIR", "/tmp/graft_skew")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    writeSkewedDocs(spark, dir, n, hotFrac)
    writeSkewedEvents(spark, dir, n * 4, hotFrac)
    // steady-state warm-up at the small uniform fixture (same methodology
    // as Bench: timed numbers measure throughput, not JIT)
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      (skewQueries ++ skewEventQueries).foreach { q =>
        try SparkEntry.queries(q)(spark, warmDir).count()
        catch { case _: Throwable => () }
      }
    val results = (skewQueries ++ skewEventQueries).map { name =>
      val t0 = System.nanoTime()
      val ok = try { SparkEntry.queries(name)(spark, dir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench-skew] $name FAILED: ${e.getMessage}")
          false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total_skew","value":${results.map(_._2).sum},""" +
      s""""unit":"sec","queries":$qs,"sf":"skew-n$n-hot$hotFrac"}""")
    spark.stop()
  }
}

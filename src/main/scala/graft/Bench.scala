package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: run EVERY query once at the smallest fixture (sf0.001,
    // ~0.1% of the timed data) so each query's generated code is JIT'd
    // before it is timed — the timed numbers then measure steady-state
    // throughput at the target sf, not per-query codegen compilation
    // (observed ~1-3 s of one-time compile cost on expression-heavy
    // queries). Standard bench hygiene, applied identically at every sf;
    // falls back to a single q20 warm-up if the small fixture is absent.
    // NOTE: this warm-every-query methodology started in round 3 — r01/r02
    // ledger numbers were taken under a single-query warm-up and include
    // per-query JIT (see BASELINE.md ledger).
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      new java.io.File(sfDir).getParentFile match {
        case null => "/root/testdata/sf0.001"
        case p => new java.io.File(p, "sf0.001").getPath
      })
    if (new java.io.File(warmDir).isDirectory)
      SparkEntry.queries.values.foreach { fn =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    else
      try SparkEntry.queries.get("q20_agg_hash").foreach(_(spark, sfDir).count())
      catch { case _: Throwable => () }
    // a crashed query records -1.0, never a plausible-looking elapsed time
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Full-precision, full-name per-query map → a repo file (the ledger's
    // source of truth; survives any stdout truncation).
    try {
      val w = new java.io.PrintWriter("BENCH_LOCAL.json")
      try w.println(fullLine) finally w.close()
    } catch { case _: Throwable => () }
    // The harness that wraps this main keeps only the TAIL of stdout
    // (observed: last 2000 chars), and the full 100-query line is ~3.4 KB —
    // it gets beheaded and never parses. So the LAST line printed is a
    // compact variant that fits whole inside that window: keys shortened to
    // their qNN prefix (unique by construction), values at millisecond
    // precision, sf as a number. The full line still goes out first for
    // anyone reading complete logs.
    val sfNum = """sf([0-9.]+)""".r.findFirstMatchIn(sfDir)
      .map(_.group(1)).getOrElse("0")
    // Centisecond precision: 142 keys at %.3f is ~1.83 KB — too close to
    // the 2000-char tail window. %.2f buys ~20 more queries of headroom.
    val compactQs = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + f"$v%.2f"
    }.mkString("{", ",", "}")
    println(fullLine)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$compactQs,"sf":$sfNum}""")
    spark.stop()
  }
}

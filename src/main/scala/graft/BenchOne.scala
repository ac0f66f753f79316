package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: time a single declared query at a given sf. Optional third
  * arg = warm-up dir (mirrors Bench's warm-at-sf0.001/time-at-target
  * methodology; default warms at the target sf).
  */
object BenchOne extends App {
  val (name, sfDir, warmDir) = args match {
    case Array(n, d) => (n, d, d)
    case Array(n, d, w) => (n, d, w)
  }
  val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
  val spark = SparkSession.builder().master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    // mirror Bench's scan-split sizing (see Bench.scala) so single-query
    // timings are comparable to ledger rows
    .config("spark.sql.files.maxPartitionBytes", s"${8L * 1024 * 1024}")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  // SPARK_GRAFT_CONF="k=v;k2=v2" sets runtime confs before the query
  // builds — the lever for timing the graft.scale.* escalation branches
  // (ScaleEscalationSpec pins their EQUALITY; this measures their cost).
  // blank entries (empty env value, leading/trailing/double ';') are
  // skipped, not fatal; an empty VALUE ('k=') is rejected loudly — it
  // would silently set an empty-string conf (ADVICE r9)
  sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').map(_.trim)
    .filter(_.nonEmpty).foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty && v.trim.nonEmpty =>
          spark.conf.set(k.trim, v.trim)
        case _ => sys.error(s"SPARK_GRAFT_CONF entry '$kv' is not k=v")
      }
    })
  val fn = SparkEntry.queries(name)
  fn(spark, warmDir).count() // warm (JIT; target-sf page cache only if warmDir == sfDir)
  // sweep the warm run's pinned final-round checkpoint blocks BEFORE the
  // first timed repeat — otherwise run 1 starts with less free storage
  // memory than runs 2..n and the repeat-flatness probe reads skewed
  graft.functions.Checkpoints.sweep(spark)
  // SPARK_GRAFT_BENCH_REPEATS > 1 prints every run — the repeat-flatness
  // probe for iterative operators (leaked checkpoint blocks show up as a
  // rising runs array; see Checkpoints). Sweeps leftovers between runs
  // exactly like Bench.
  val repeats = math.max(1,
    sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "1").toInt)
  val secs = (1 to repeats).map { _ =>
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val s = (System.nanoTime() - t0) / 1e9
    graft.functions.Checkpoints.sweep(spark)
    (n, s)
  }
  val runs = secs.map(r => f"${r._2}%.2f").mkString(",")
  println(f"BENCHONE $name rows=${secs.last._1} sec=${secs.last._2}%.2f runs=[$runs]")
  spark.stop()
}

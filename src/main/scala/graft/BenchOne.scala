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
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val fn = SparkEntry.queries(name)
  fn(spark, warmDir).count() // warm (JIT; target-sf page cache only if warmDir == sfDir)
  val t0 = System.nanoTime()
  val n = fn(spark, sfDir).count()
  println(f"BENCHONE $name rows=$n sec=${(System.nanoTime()-t0)/1e9}%.2f")
  spark.stop()
}

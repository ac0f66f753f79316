package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool (round 12): dump `.explain("formatted")` for a named set of
  * queries to per-query files — the before/after plan evidence the
  * optimization rounds commit under `plans/r12/`.
  *
  * Usage: PlanDump <outDir> <suffix> q81_sim_jaccard[,q85_...]...
  * Writes <outDir>/<query>_<suffix>.txt per query. Mirrors the bench's
  * session config (local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus,
  * 8 MiB splits) so the dumped plan is the plan the bench times — a
  * local[4]/default-splits dump can differ in scan partitioning and AQE
  * behavior.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <q1,q2,...>")
    val outDir = new java.io.File(args(0))
    outDir.mkdirs()
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", s"${8L * 1024 * 1024}")
      .config("spark.ui.enabled", "false")
    ClusterProfile.configure(builder)
    val spark = builder.getOrCreate()
    ClusterProfile.installCheckpoints(spark)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      val fn = SparkEntry.queries.getOrElse(q,
        sys.error(s"unknown query $q"))
      val plan = fn(spark, sfDir).queryExecution.explainString(FormattedMode)
      val w = new java.io.PrintWriter(new java.io.File(outDir, s"${q}_$suffix.txt"))
      try w.println(plan) finally w.close()
      println(s"[plandump] wrote ${q}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Distributed-reality profile (round 11, VERDICT item 1): the driver
    // gate runs local[n], but tools/cluster_gate.sh re-runs the whole
    // surface on a local-cluster master — real executor JVMs, real
    // closure serialization, real broadcast/shuffle transport — with the
    // reliable Checkpoints branch on. Everything below is env-driven so
    // the driver's contract (two args, local master) is unchanged.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // ship the application classes to real executors (local-cluster JVMs
    // share nothing with the driver's classpath)
    sys.env.get("SPARK_GRAFT_JARS").foreach(builder.config("spark.jars", _))
    sys.env.get("SPARK_GRAFT_EXEC_MEM")
      .foreach(builder.config("spark.executor.memory", _))
    // non-local masters need a shared-filesystem TextCache root (the
    // java-temp fallback is driver-local by definition)
    sys.env.get("SPARK_GRAFT_TEXTCACHE_DIR")
      .foreach(builder.config(graft.functions.TextCache.DirConfKey, _))
    val spark = builder.getOrCreate()
    // reliable checkpoints: the cluster-profile branch of Checkpoints.cut
    // (executor loss must not strand an iterative operator mid-loop)
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR").foreach { dir =>
      spark.sparkContext.setCheckpointDir(dir)
      spark.conf.set(graft.functions.Checkpoints.ReliableConfKey, "true")
    }
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-only: SPARK_GRAFT_ONLY=q155_x,q156_y restricts the dump (the
    // driver never sets it; compare.py walks whatever dirs exist)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // free the finished query's leftover checkpoint blocks (iterative
      // operators pin their final round; see Checkpoints.sweep)
      graft.functions.Checkpoints.sweep(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

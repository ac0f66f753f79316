package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev tool (round 12): run one declared query (warm, then timed) and
  * print a per-stage breakdown — submit→complete wall span, executor-run
  * task-time sum, task count, shuffle/scan bytes — so a slow ledger row
  * can be attributed to a stage instead of guessed at (the sandbox has
  * no Spark UI; this is the §7.1 substitute).
  *
  * Usage: StageProfile <query> <sfDir> [warmDir]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val (name, sfDir, warmDir) = args match {
      case Array(n, d) => (n, d, d)
      case Array(n, d, w) => (n, d, w)
      case _ => sys.error("usage: StageProfile <query> <sfDir> [warmDir]")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", s"${8L * 1024 * 1024}")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    fn(spark, warmDir).count()
    graft.functions.Checkpoints.sweep(spark)

    case class St(id: Int, name: String, wallMs: Long, taskMs: Long,
                  tasks: Int, inBytes: Long, shRead: Long, shWrite: Long)
    val stages = mutable.ArrayBuffer[St]()
    val jobs = mutable.ArrayBuffer[(Int, Long)]()
    var t0 = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs += ((j.jobId, j.time)) }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        stages.synchronized {
          stages += St(i.stageId, i.name.takeWhile(_ != '\n'),
            (for {a <- i.completionTime; b <- i.submissionTime} yield a - b)
              .getOrElse(-1L),
            m.executorRunTime, i.numTasks, m.inputMetrics.bytesRead,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e6
    Thread.sleep(500) // let the listener bus drain (no public wait API)
    println(f"QUERY $name rows=$n wall=${wall}%.0f ms jobs=${jobs.size} stages=${stages.size}")
    println(f"${"stage"}%6s ${"wall_ms"}%8s ${"task_ms"}%8s ${"tasks"}%6s ${"in_mb"}%7s ${"shr_mb"}%7s ${"shw_mb"}%7s  name")
    stages.sortBy(_.id).foreach { s =>
      println(f"${s.id}%6d ${s.wallMs}%8d ${s.taskMs}%8d ${s.tasks}%6d " +
        f"${s.inBytes / 1e6}%7.1f ${s.shRead / 1e6}%7.2f ${s.shWrite / 1e6}%7.2f  ${s.name}")
    }
    spark.stop()
  }
}

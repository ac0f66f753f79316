package graft

import org.apache.spark.sql.SparkSession

/** The one place the env-driven distributed profile is interpreted
  * (round 12 review: the master/jars/executor-mem/TextCache/checkpoint
  * plumbing had been copy-pasted into three mains, and the copies had
  * already drifted — StreamChaos silently lacked the shared-filesystem
  * TextCache and reliable-checkpoint knobs its local-cluster master
  * needs).
  *
  * Env contract (shared by Verify, Bench, StreamChaos and the tools/
  * gate scripts):
  *  - SPARK_GRAFT_MASTER         master URL (default local[cpus])
  *  - SPARK_GRAFT_JARS           app jar for executor classpaths
  *    (local-cluster / standalone executor JVMs share nothing with the
  *    driver's classpath)
  *  - SPARK_GRAFT_EXEC_MEM       spark.executor.memory
  *  - SPARK_GRAFT_TEXTCACHE_DIR  shared-filesystem TextCache root (the
  *    java-temp fallback is driver-local by definition)
  *  - SPARK_GRAFT_CHECKPOINT_DIR reliable-checkpoint root; setting it
  *    also flips [[graft.functions.Checkpoints.ReliableConfKey]] on
  */
object ClusterProfile {

  /** True for in-process masters — `local`, `local[N]`, `local[*]`,
    * `local[N,F]` — and false for everything that forks executor JVMs
    * (`local-cluster[...]`, `spark://`, `yarn`, ...). Used by Bench's
    * ledger routing: only a genuinely distributed run may write the
    * cluster ledger, so an explicitly-exported `SPARK_GRAFT_MASTER=
    * local[32]` still faces the local pin's anti-ratchet guards instead
    * of silently clobbering BENCH_CLUSTER numbers with in-process ones.
    */
  def isLocalMaster(master: String): Boolean =
    master == "local" || master.matches("""local\[[^\]]*\]""")

  /** Apply the builder-time profile knobs (jars, executor memory,
    * shared TextCache root). Master/shuffle-partition choice stays with
    * the caller — Verify and Bench document different defaults. */
  def configure(builder: SparkSession.Builder): SparkSession.Builder = {
    sys.env.get("SPARK_GRAFT_JARS").foreach(builder.config("spark.jars", _))
    sys.env.get("SPARK_GRAFT_EXEC_MEM")
      .foreach(builder.config("spark.executor.memory", _))
    sys.env.get("SPARK_GRAFT_TEXTCACHE_DIR")
      .foreach(builder.config(graft.functions.TextCache.DirConfKey, _))
    builder
  }

  /** Post-session knob: reliable checkpoints (the cluster-profile branch
    * of Checkpoints.cut — executor loss must not strand an iterative
    * operator mid-loop). */
  def installCheckpoints(spark: SparkSession): Unit =
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR").foreach { dir =>
      spark.sparkContext.setCheckpointDir(dir)
      spark.conf.set(graft.functions.Checkpoints.ReliableConfKey, "true")
    }
}

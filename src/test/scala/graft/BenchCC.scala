package graft

import graft.functions.Components
import graft.operators.PipelineQueries
import org.apache.spark.sql.functions._

/** Scratch profiler for the q100 CC loop — not a test; run via
  * `Test/runMain graft.BenchCC <sfDir>`. */
object BenchCC {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"CCPROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    PipelineQueries.q94_dedup_lsh_lang(spark, dir).count()
    val pairs = t("q94_pairs_materialize") {
      PipelineQueries.q94_dedup_lsh_lang(spark, dir)
        .select(col("id_a"), col("id_b")).localCheckpoint()
    }
    println(s"CCPROBE n_pairs ${pairs.count()}")
    val cc = t("cc_total") {
      Components.connectedComponents(pairs, "id_a", "id_b")
    }
    println(s"CCPROBE n_nodes ${cc.count()}")
    spark.stop()
  }
}

package graft.plans

import graft.GraftSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiler comparing the TopKPerKey operator against the Window
  * row_number formulation — not a test; run via
  * `Test/runMain graft.plans.BenchTopK <sfDir> <k>`. */
object BenchTopK {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(3)
    def t(tag: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"TOPKPROBE $tag n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val orders = graft.Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t("window_rownumber") {
      orders.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn").count()
    }
    t("topk_perkey") {
      TopK.perKey(orders, Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), k).count()
    }
    spark.stop()
  }
}

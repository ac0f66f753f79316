package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ScalableRank vs the naive group window: identical exact ranks on
  * random data AND under a 90% point mass, identical across 1/4/32
  * layouts, and the corpus window actually keyed by the id sub-bucket.
  */
class ScalableRankSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("g")).orderBy(col("v").asc, col("id").asc)
    val wt = Window.partitionBy(col("g"))
    df.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wt))
      .select("g", "id", "rn", "n")
  }

  private def collectRanks(df: org.apache.spark.sql.DataFrame) =
    df.select("g", "id", "rn", "n").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("matches the naive window on random (value, id) data") {
    val rnd = new scala.util.Random(5)
    val rows = (0L until 2000L).map(i =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(50).toLong, i))
    val df = rows.toDF("g", "v", "id")
    val got = collectRanks(
      ScalableRank.rowNumbers(df, Seq("g"), "v", "id", idBucketWidth = 64))
    assert(got == collectRanks(naive(df)))
  }

  test("90% point mass: ranks stay exact and the hot value splits " +
    "across id sub-buckets") {
    // 5000 rows, 90% share v=7 — the distribution that collapses
    // fixed-width value buckets to one task
    val rows = (0L until 5000L).map(i =>
      ("g0", if (i % 10 == 0) (i % 97) + 100L else 7L, i))
    val df = rows.toDF("g", "v", "id")
    val ranked = ScalableRank.rowNumbers(df, Seq("g"), "v", "id",
      idBucketWidth = 256)
    assert(collectRanks(ranked) == collectRanks(naive(df)))
    // plan evidence: the corpus-sized window partitions by (g, v, __ib),
    // so the hot value's 4500 rows never meet in one frame
    val p = ranked.queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(g#\\d+, v#\\d+L, __ib#\\d+L".r
      .findFirstIn(p).isDefined, p.take(1500))
  }

  test("identical results under 1/4/32 partition layouts") {
    val rnd = new scala.util.Random(9)
    val rows = (0L until 1000L).map(i =>
      (s"g${rnd.nextInt(2)}", rnd.nextInt(5).toLong, i))
    val sets = Seq(1, 4, 32).map { parts =>
      collectRanks(ScalableRank.rowNumbers(
        rows.toDF("g", "v", "id").repartition(parts),
        Seq("g"), "v", "id", idBucketWidth = 32))
    }
    assert(sets(0) == sets(1) && sets(1) == sets(2))
  }

  test("sparse ids (gaps, non-dense) rank correctly") {
    val rows = Seq(("a", 1L, 1000000L), ("a", 1L, 5L), ("a", 0L, 999L),
      ("a", 1L, 70000L), ("b", 2L, 3L))
    val df = rows.toDF("g", "v", "id")
    val got = ScalableRank.rowNumbers(df, Seq("g"), "v", "id",
        idBucketWidth = 10)
      .select("g", "id", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", 999L) -> 1L, ("a", 5L) -> 2L,
      ("a", 70000L) -> 3L, ("a", 1000000L) -> 4L, ("b", 3L) -> 1L))
  }
}

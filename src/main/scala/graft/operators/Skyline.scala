package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** d-dimensional skyline (Pareto frontier, all dims maximized) as a
  * two-phase distributed operator — the standard local-skyline-then-merge
  * decomposition from the skyline literature (Börzsönyi et al., ICDE'01
  * block-nested-loop run per partition):
  *
  *  1. LOCAL phase: each partition prunes every point dominated by another
  *     point in the same partition (dominance is transitive, so a locally
  *     dominated point is globally dominated — removal is always safe, and
  *     every dominator of a removed point survives somewhere).
  *  2. MERGE phase: the survivor set — skyline-sized, orders of magnitude
  *     smaller than the input — is broadcast and an exact dominance
  *     anti-join keeps only globally undominated points.
  *
  * The result is the exact skyline regardless of how the input was
  * partitioned, which is what makes the declared query hash-stable. q150's
  * 2-D variant exploits the sortability of 2-D skylines instead; this
  * operator is the d>2 path where no single sort axis linearizes dominance.
  *
  * Scale: the local prune is a per-partition scan (sorted desc
  * lexicographically, so only earlier-kept points can dominate later ones
  * — one pass against the kept list); memory is bounded by the partition
  * (maxPartitionBytes), and the merge side is |skyline| rows, a broadcast
  * by construction. Against adversarially large skylines, the merge phase
  * falls back from broadcast automatically only by raising
  * autoBroadcastJoinThreshold — the anti-join condition itself is a
  * nested-loop either way.
  */
object Skyline {

  /** a dominates b: ≥ on every dim, > on at least one. */
  private def dominates(a: Array[Long], b: Array[Long]): Boolean = {
    var strict = false
    var i = 0
    while (i < a.length) {
      if (a(i) < b(i)) return false
      if (a(i) > b(i)) strict = true
      i += 1
    }
    strict
  }

  private def localPrune(rows: Iterator[Row], dimIdx: Array[Int]): Iterator[Row] = {
    val buf = rows.toArray
    val keys = buf.map(r => dimIdx.map(r.getLong))
    // desc lexicographic order: a later point never strictly dominates an
    // earlier one (it would have to sort before it), so one forward pass
    // comparing only against the kept list is exact
    val order = buf.indices.sortWith { (i, j) =>
      val a = keys(i); val b = keys(j)
      var k = 0
      while (k < a.length && a(k) == b(k)) k += 1
      k < a.length && a(k) > b(k)
    }
    val kept = ArrayBuffer.empty[Int]
    order.foreach { i =>
      if (!kept.exists(k => dominates(keys(k), keys(i)))) kept += i
    }
    kept.iterator.map(buf)
  }

  /** Exact skyline of `df` maximizing the LongType columns `dims`. */
  def of(df: DataFrame, dims: Seq[String]): DataFrame = {
    val dimIdx = dims.map(df.schema.fieldIndex).toArray
    // eager lineage cut (Checkpoints.cut: local checkpoint, reliable on
    // the cluster profile): the survivor set feeds BOTH sides of the
    // merge join — without it each side recomputes the upstream plan +
    // prune (same RDD, two uncached scans)
    val pruned = df.sparkSession
      .createDataFrame(df.rdd.mapPartitions(localPrune(_, dimIdx)), df.schema)
      .transform(graft.functions.Checkpoints.cut(_))
    val ge = dims.map(d => col(s"q.$d") >= col(s"p.$d")).reduce(_ && _)
    val gt = dims.map(d => col(s"q.$d") > col(s"p.$d")).reduce(_ || _)
    pruned.as("p").join(broadcast(pruned.as("q")), ge && gt, "left_anti")
  }

  /** 3-D customer-value skyline (q156): which customers are Pareto-optimal
    * on (lifetime spend, order count, recency)? No customer in the output
    * is beaten-or-tied on all three axes (with one strict beat) by anyone.
    * Dims are exact integers — cents, counts, epoch days — so dominance
    * needs no float tolerance and the oracle (a NOT-EXISTS self-join,
    * feasible at oracle scale; the two-phase operator is the cluster
    * path) hash-matches bit-for-bit. Order by c_custkey.
    */
  def q156_skyline3d(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"),
        count(lit(1)).as("n_orders"),
        max(expr(Det.epochDaySql("o_orderdate"))).as("last_day"))
    of(c, Seq("total_cents", "n_orders", "last_day"))
      .orderBy(col("c_custkey"))
  }

  val oracle: Map[String, String] = Map(
    "q156_skyline3d" ->
      """WITH c AS (
        |  SELECT o_custkey AS c_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
        |    count(*) AS n_orders,
        |    CAST(max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS BIGINT) AS last_day
        |  FROM orders GROUP BY 1)
        |SELECT c_custkey, total_cents, n_orders, last_day FROM c p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM c q
        |  WHERE q.total_cents >= p.total_cents
        |    AND q.n_orders >= p.n_orders
        |    AND q.last_day >= p.last_day
        |    AND (q.total_cents > p.total_cents
        |      OR q.n_orders > p.n_orders
        |      OR q.last_day > p.last_day))
        |ORDER BY c_custkey""".stripMargin,
  )
}

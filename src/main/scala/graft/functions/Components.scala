package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an edge list — the dedup-cluster step that
  * turns pairwise near-duplicate hits (q85/q94/q86 output) into groups, so
  * a pipeline can keep one canonical document per cluster instead of
  * dropping both ends of every pair.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round, every node takes the min of its own label and
  * its neighbors' labels; stop when a round changes nothing. Rounds needed
  * = graph diameter. Near-dup clusters are dense (pairs come from shared
  * shingle buckets, so members connect within 1-2 hops) — diameters stay
  * single-digit even at corpus scale, which is why production dedup at
  * 100 TB ships exactly this loop (the log-rounds alternative,
  * small-star/large-star contraction [Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC 2014 — public literature],
  * only pays off on high-diameter graphs like web link paths).
  *
  * Scale shape per round: one shuffle-join of the edge list against the
  * label frame on node id plus one groupBy-min — both partition on the
  * same key, so AQE reuses the exchange. The label frame is
  * `localCheckpoint`ed every round: persist alone caches DATA but keeps
  * LINEAGE, and a self-referential iterative plan doubles in size per
  * round until analysis itself OOMs (observed at ~19 rounds). Checkpoint
  * truncates the plan to the materialized RDD, so every round re-plans
  * from a constant-size tree; superseded checkpoint blocks are freed by
  * the ContextCleaner once the previous round's frame is unreferenced.
  * (On a cluster where executor loss must not kill the job, swap in
  * reliable `checkpoint()` with a checkpoint dir — same lineage cut.)
  * The convergence probe is a `limit(1).count()` on changed labels — a
  * driver action per round, but O(1) rows collected; the label state
  * itself never reaches the driver.
  */
object Components {

  /** @param pairs edge list; rows are undirected edges
    * @param aCol   one endpoint column (any orderable type with min)
    * @param bCol   other endpoint column (same type)
    * @param maxIter convergence bound; throws if not converged (a graph
    *                needing >25 min-propagation rounds has diameter >25 —
    *                switch to star-contraction before raising this)
    * @return (id, component) for every node appearing in `pairs`, where
    *         component = min node id reachable from `id` — deterministic
    *         regardless of partitioning or iteration order
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    val edges = pairs.select(col(aCol).as("s"), col(bCol).as("t"))
      .union(pairs.select(col(bCol).as("s"), col(aCol).as("t")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("s").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // neighbor labels flow along edges; each node keeps the min of
      // (own label, incoming neighbor labels)
      val msgs = edges
        .join(labels.withColumnRenamed("id", "s"), "s")
        .select(col("t").as("id"), col("component"))
      // eager localCheckpoint = materialize AND cut lineage (see scaladoc)
      val next = labels.select("id", "component").union(msgs)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint()
      val changed = next.as("n")
        .join(labels.select(col("id"), col("component").as("old")), "id")
        .filter(col("component") < col("old"))
        .limit(1).count()
      labels = next
      converged = changed == 0L
      iter += 1
    }
    edges.unpersist(blocking = false)
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds " +
        "(graph diameter exceeds the bound — use star contraction)")
    labels
  }
}

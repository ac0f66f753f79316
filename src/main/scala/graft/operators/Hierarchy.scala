package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Hierarchy flattening — the recursive-CTE workload (org charts, category
  * trees, thread/reply chains, BOM explosions) Spark has no native
  * `WITH RECURSIVE` for. Given (id, parent) rows (parent NULL at roots),
  * emit every node's root and depth.
  *
  * Algorithm: pointer doubling (recursive doubling / path halving — the
  * classic PRAM list-ranking technique, Wyllie 1979; the same shape
  * Spark GraphFrames uses for shortest-path label compaction). State is
  * one row per node `(id, anc, depth, settled)` where `anc` is a known
  * ancestor and `depth` the exact hop count to it. Each round self-joins
  * the state on `anc = id`, composing ancestor pointers: unsettled rows
  * jump to their ancestor's ancestor and add the hop counts. Every round
  * DOUBLES the distance compacted, so a hierarchy of depth d needs
  * ⌈log₂ d⌉ rounds — 5 joins for depth 17 (the sf0.1 fixture), 30 joins
  * for a depth-10⁹ pathological chain — where naive per-level BFS
  * (`JOIN r ON n.parent = r.id`, the recursive CTE's own plan) needs d
  * full shuffles. That log-vs-linear gap is the 100 TB argument: round
  * cost is a self-join hash-partitioned on the pointer column, and the
  * unsettled frontier shrinks as chains resolve, so late rounds touch a
  * sliver of the node set.
  *
  * Lineage discipline: the per-round plan is self-referential, so each
  * round ends in `localCheckpoint` (the [[graft.functions.Components]]
  * propagation-loop lesson — persist alone doubles the analysis tree per
  * round until the driver OOMs). Convergence is checked with a count on
  * the unsettled frontier (one action per round, log-many rounds total —
  * not a per-row driver loop).
  *
  * Cycle safety: rows on a parent cycle (malformed input — no root is
  * reachable) never settle; after `maxIter` rounds they are dropped and
  * reported via the `onUnresolved` callback rather than looping forever.
  */
object Hierarchy {

  /** Flatten a parent-pointer forest to (id, root, depth).
    *
    * @param nodes     one row per node
    * @param idCol     node id column (any equatable type; nulls dropped)
    * @param parentCol parent id column, NULL marks a root
    * @param maxIter   pointer-doubling round bound — resolves hierarchies
    *                  up to depth 2^maxIter (default 2³² levels)
    * @param onUnresolved called with the count of never-settled rows
    *                  (cycles / dangling parents) when positive
    * @return (id, root, depth) with depth a long, one row per node whose
    *         chain reaches a root
    */
  def flatten(nodes: DataFrame, idCol: String, parentCol: String,
              maxIter: Int = 32,
              onUnresolved: Long => Unit = _ => ()): DataFrame = {
    val init = nodes
      .filter(col(idCol).isNotNull)
      .select(
        col(idCol).as("id"),
        coalesce(col(parentCol), col(idCol)).as("anc"),
        when(col(parentCol).isNull, 0L).otherwise(1L).as("depth"),
        col(parentCol).isNull.as("settled"))
    var state = init.localCheckpoint(true)
    var frontier = state.filter(!col("settled")).count()
    var iter = 0
    while (frontier > 0 && iter < maxIter) {
      // compose pointers: s.anc -> t means s's new ancestor is t.anc at
      // distance s.depth + t.depth. Only the unsettled frontier joins
      // (the left side shrinks every round); the lookup side must be the
      // FULL state — a frontier row's ancestor may itself be settled.
      val s = state.filter(!col("settled")).as("s")
      val t = state.select(col("id").as("t_id"), col("anc").as("t_anc"),
        col("depth").as("t_depth"), col("settled").as("t_settled"))
      val jumped = s.join(t, col("s.anc") === col("t_id"), "left").select(
        col("s.id").as("id"),
        col("t_anc").as("anc"),
        (col("s.depth") + col("t_depth")).as("depth"),
        coalesce(col("t_settled"), lit(false)).as("settled"))
      val prev = state
      state = state.filter(col("settled")).unionByName(jumped)
        .localCheckpoint(true)
      prev.unpersist(false)
      frontier = state.filter(!col("settled")).count()
      iter += 1
    }
    if (frontier > 0) onUnresolved(frontier)
    val out = state.filter(col("settled"))
      .select(col("id"), col("anc").as("root"), col("depth"))
    out
  }

  /** q143: flatten a deterministic customer referral forest — parent(k) =
    * 1 + (md5-int(k) mod (k−1)) for k > 5 (always a smaller key ⇒ acyclic
    * by construction), keys ≤ 5 are roots. The oracle replays the SAME
    * edge derivation and resolves it with DuckDB's native
    * `WITH RECURSIVE` — the hash check proves the log-round pointer
    * doubling computes exactly what the linear-round recursive CTE
    * semantics define, on every row. Emit (id, root, depth); order by id.
    */
  def q143_hierarchy_flatten(spark: SparkSession, sfDir: String): DataFrame = {
    val h = conv(substring(md5(col("c_custkey").cast("string")), 1, 8), 16, 10)
      .cast("long")
    val nodes = Tables.customer(spark, sfDir).select(
      col("c_custkey").as("id"),
      when(col("c_custkey") <= 5, lit(null).cast("long"))
        .otherwise(lit(1L) + h % (col("c_custkey") - 1)).as("parent"))
    flatten(nodes, "id", "parent").orderBy(col("id"))
  }

  val oracle: Map[String, String] = Map(
    "q143_hierarchy_flatten" ->
      """WITH RECURSIVE nodes AS (
        |  SELECT c_custkey AS id,
        |    CASE WHEN c_custkey <= 5 THEN NULL
        |      ELSE 1 + CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
        |                    AS BIGINT) % (c_custkey - 1) END AS parent
        |  FROM customer),
        |r AS (
        |  SELECT id, id AS root, CAST(0 AS BIGINT) AS depth
        |  FROM nodes WHERE parent IS NULL
        |  UNION ALL
        |  SELECT n.id, r.root, r.depth + 1
        |  FROM nodes n JOIN r ON n.parent = r.id)
        |SELECT id, root, depth FROM r ORDER BY id""".stripMargin)
}

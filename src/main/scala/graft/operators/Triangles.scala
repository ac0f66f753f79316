package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-ordered triangle counting (Suri–Vassilvitskii, WWW'11 — public
  * literature): the skew-proof refinement of q151's id-oriented wedge
  * enumeration.
  *
  * Both variants enumerate each triangle exactly once as a wedge closed
  * by its third edge; the difference is which vertex owns the wedge.
  * Id-orientation gives it to the smallest id — a hub vertex with degree
  * d owns up to d²/2 wedges, so one celebrity makes one task quadratic.
  * Degree-orientation (edges point from the (deg, id)-smaller endpoint
  * to the larger) gives every triangle to its LOWEST-DEGREE vertex: the
  * per-vertex wedge count is bounded by (out-degree)² where out-degree
  * ≤ max(deg of the smaller side), and summed wedge volume drops from
  * Σdeg² to O(m^{3/2}) on any graph — the hub never owns its fan-in.
  *
  * Plan shape: a degree agg, two broadcast-or-shuffle equi-joins to
  * attach endpoint degrees, one self-join on the wedge owner, one
  * closure join — all shuffled hash joins, no cartesian; the (deg, id)
  * composite makes the orientation a strict total order, so the closure
  * probe is a single directed lookup.
  */
object Triangles {

  /** Per-vertex triangle counts from an undirected edge list `und` with
    * columns (a, b), a < b, no duplicates. Returns (id, n_tri) for every
    * vertex in at least one triangle.
    */
  def perVertexDegreeOrdered(und: DataFrame): DataFrame = {
    val deg = und.select(col("a").as("v"))
      .unionByName(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // oriented edge src→dst with src ≺ dst in (deg, id); carry dst's rank
    // so wedges can be canonically ordered without another deg join
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("ddst"))
    val e1 = oriented.select(col("src").as("u"), col("dst").as("x"),
      col("ddst").as("dx"))
    val e2 = oriented.select(col("src").as("u2"), col("dst").as("y"),
      col("ddst").as("dy"))
    // wedge (x ≺ y) owned by u; the closing edge, if present, is x→y
    val wedges = e1.join(e2, col("u") === col("u2") &&
        (col("dx") < col("dy") ||
          (col("dx") === col("dy") && col("x") < col("y"))))
      .select(col("u"), col("x"), col("y"))
    val closer = oriented.select(col("src").as("x"), col("dst").as("y"))
    val tri = wedges.join(closer, Seq("x", "y"))
    tri.select(col("u").as("id"))
      .unionByName(tri.select(col("x").as("id")))
      .unionByName(tri.select(col("y").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
  }

  /** Wedge (candidate-pair) volume of the degree-ordered orientation —
    * the quantity the orientation bounds; exposed for the skew spec. */
  def wedgeCountDegreeOrdered(und: DataFrame): Long = {
    val deg = und.select(col("a").as("v"))
      .unionByName(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val outDeg = withDeg
      .select(when(aFirst, col("a")).otherwise(col("b")).as("src"))
      .groupBy(col("src")).agg(count(lit(1)).as("d"))
    outDeg.select(sum(col("d") * (col("d") - 1) / 2).cast("long"))
      .head().getLong(0)
  }

  /** Same volume under naive id-orientation (q151's rule) — quadratic at
    * a hub; the spec asserts the degree-ordered count is never larger. */
  def wedgeCountIdOrdered(und: DataFrame): Long = {
    val outDeg = und.groupBy(col("a")).agg(count(lit(1)).as("d"))
    outDeg.select(sum(col("d") * (col("d") - 1) / 2).cast("long"))
      .head().getLong(0)
  }
}

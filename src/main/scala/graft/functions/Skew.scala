package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins and aggregations (SURVEY §7.4.8).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime, but two
  * shapes still need explicit salting at 100 TB:
  *  - aggregations with a single hot key (partial agg helps, but a hot
  *    group's partials still converge on one reducer);
  *  - joins where the hot side must meet a *replicable* right side.
  *
  * `saltedAgg` does the classic two-phase aggregate: group on
  * (key, salt) first — the hot key fans out over `buckets` reducers —
  * then re-aggregate on the key alone. `saltedJoin` fans the skewed left
  * side over salts and replicates the right side once per salt value.
  */
object Skew {

  /** deterministic salt in [0, buckets): hash of a caller-chosen
    * disambiguator column. Pass a stable row id (not something like
    * spark_partition_id, which varies across runs) so salted output is
    * reproducible.
    */
  def salt(disambiguator: Column, buckets: Int): Column =
    pmod(xxhash64(disambiguator), lit(buckets.toLong)).cast("int")

  /** Two-phase (salted) sum/count aggregation over one hot key column.
    * `aggs` maps output name → (column to sum). Counts are sums of 1s.
    */
  def saltedSum(df: DataFrame, key: String, idCol: String, buckets: Int,
                aggs: Map[String, Column]): DataFrame = {
    val partials = aggs.toSeq.map { case (n, c) => sum(c).as(n) }
    val finals = aggs.keys.toSeq.map(n => sum(col(n)).as(n))
    df.withColumn("__salt", salt(col(idCol), buckets))
      .groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(finals.head, finals.tail: _*)
  }

  /** Skew-safe equi-join: the (big, skewed) left side gets a salt from its
    * row id; the right side is replicated once per salt bucket, so the hot
    * key's rows spread across `buckets` tasks instead of one.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 leftIdCol: String, buckets: Int): DataFrame = {
    val salted = left.withColumn("__salt", salt(col(leftIdCol), buckets))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}

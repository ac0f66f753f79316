package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.Components
import graft.sources.Sources
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The 100 TB deployment shape SCALE.md prescribes for the cluster-based
  * dedup queries: q100/q108/q109 as DECLARED queries each re-derive the
  * LSH pair graph standalone, but a real pipeline materializes the
  * cluster table ONCE and every consumer (canonical selection, keep-best,
  * reporting) reads the artifact. This spec proves that flow end-to-end:
  * same answers from the materialized table, and a bucketed layout feeds
  * the doc_id join without a fresh exchange on the artifact side.
  */
class MaterializedClustersSpec extends SparkSpec {

  test("materialized (bucketed) cluster table reproduces q108 and joins " +
    "without re-shuffling the artifact") {
    val docs = Tables.documents(spark, sfDir)
    val pairs = PipelineQueries.q94_dedup_lsh_lang(spark, sfDir)
      .select(col("id_a"), col("id_b"))
    val cc = Components.connectedComponents(pairs, "id_a", "id_b")

    // materialize ONCE, bucketed by the join key the consumers use
    Sources.writeBucketed(
      cc.select(col("id").as("doc_id"), col("component")),
      "clusters_b", "doc_id", 4)
    try {
      val art = spark.table("clusters_b")

      // consumer 1: canonical selection from the artifact == q108 direct
      def survivors(clusters: DataFrame): Set[Long] = {
        val drop = clusters.filter(col("doc_id") =!= col("component"))
          .select(col("doc_id"))
        docs.join(drop, Seq("doc_id"), "left_anti")
          .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      }
      val direct = CorpusQueries.q108_dedup_canonical(spark, sfDir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(survivors(art) == direct)

      // consumer 2: cluster-size report from the artifact == q100's sizes
      val sizesArt = art.groupBy("component").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sizesDirect = CorpusQueries.q100_dedup_components(spark, sfDir)
        .select("component", "n_members").distinct()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sizesArt == sizesDirect)

      // plan evidence: with broadcast off, an equi-join on doc_id against
      // the bucketed artifact plans NO exchange on the artifact side
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = art.join(
        docs.select(col("doc_id"), col("lang")), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1,
        s"expected only the docs-side exchange, got $exchanges:\n" +
          plan.take(1200))
      assert(joined.count() == art.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS clusters_b")
    }
  }
}

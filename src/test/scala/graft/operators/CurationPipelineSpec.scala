package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CurationPipelineSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)
  private val cfg = CurationPipeline.Config()

  test("stages only shrink and stats are monotone") {
    val r = CurationPipeline.run(docs, cfg)
    val s = r.stats
    assert(s("input") == 500)
    assert(s("after_quality") <= s("input"))
    assert(s("after_exact_dedup") <= s("after_quality"))
    assert(s("after_near_dedup") <= s("after_exact_dedup"))
    assert(r.curated.count() == s("after_near_dedup"))
    assert(r.curated.count() > 0)
  }

  test("annotations present with sane domains") {
    val r = CurationPipeline.run(docs, cfg, collectStats = false)
    assert(Seq("n_tokens", "quality", "fingerprint")
      .forall(r.curated.columns.contains))
    assert(r.curated.filter(col("quality") < cfg.minQuality).count() == 0)
    assert(r.curated.filter(col("n_tokens") <= 0).count() == 0)
  }

  test("injected exact duplicates are removed, survivor is min id") {
    val withDups = docs.limit(10)
      .union(docs.limit(10).withColumn("doc_id", col("doc_id") + 100000))
    val out = CurationPipeline.run(withDups, cfg).curated
    assert(out.filter(col("doc_id") >= 100000).count() == 0)
    assert(out.count() <= 10)
  }

  test("pipeline is idempotent: re-running on curated output is a no-op on counts") {
    val once = CurationPipeline.run(docs, cfg).curated
      .drop("n_tokens", "quality", "fingerprint")
    val twice = CurationPipeline.run(once, cfg).curated
    assert(twice.count() == once.count())
  }
}

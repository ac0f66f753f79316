package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)

  test("exact dedup is idempotent and keeps min doc_id per digest") {
    val once = Dedup.exact(docs, "doc_id", Seq("text"))
    val twice = Dedup.exact(once, "doc_id", Seq("text"))
    assert(once.count() == twice.count())
    // no internal columns leak into user output
    assert(once.columns.toSet == docs.columns.toSet)
    // fixtures have no exact dups → dedup is identity on count
    assert(once.count() == docs.count())
  }

  test("exact dedup collapses injected duplicates to one survivor") {
    val withDup = docs.limit(3)
      .union(docs.limit(3).withColumn("doc_id", col("doc_id") + 100000))
    val out = Dedup.exact(withDup, "doc_id", Seq("text"))
    assert(out.count() == 3)
    // survivors are the original (min) ids
    assert(out.filter(col("doc_id") >= 100000).count() == 0)
  }

  test("jaccard is within [0,1], symmetric, and 1 on self") {
    val pairs = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("a")),
      (Seq("a", "b"), Seq("c", "d"))).toDF("x", "y")
    val j = pairs.select(
      Dedup.jaccard(col("x"), col("y")).as("xy"),
      Dedup.jaccard(col("y"), col("x")).as("yx")).collect()
    j.foreach { r =>
      val (xy, yx) = (r.getDouble(0), r.getDouble(1))
      assert(xy >= 0.0 && xy <= 1.0 && xy == yx)
    }
    assert(j(1).getDouble(0) == 1.0)
    assert(j(2).getDouble(0) == 0.0)
  }

  test("ngrams yield an EMPTY set for docs shorter than n (oracle parity)") {
    val g = Seq("a b", "a b c").toDF("t")
      .select(Dedup.ngrams(col("t"), 3).as("g"))
      .as[Seq[String]].collect()
    assert(g(0).isEmpty)             // 2 tokens, n=3: no truncated shingle
    assert(g(1) == Seq("a b c"))
  }

  test("exact dedup digest distinguishes column boundaries and null-vs-empty") {
    val df = Seq(
      (1L, Some("a b"), Some("c")),
      (2L, Some("a"), Some("b c")),   // same concat, different rows
      (3L, Some("a"), None),
      (4L, Some("a"), Some(""))).toDF("id", "x", "y")
    assert(Dedup.exact(df, "id", Seq("x", "y")).count() == 4)
  }

  test("ngrams produce size-n shingles, deduped") {
    val g = Seq("a b c d").toDF("t")
      .select(Dedup.ngrams(col("t"), 2).as("g"))
      .as[Seq[String]].head()
    assert(g.toSet == Set("a b", "b c", "c d"))
  }

  test("ngram near-dups: self-copy detected at jaccard 1.0, blocked by lang") {
    val base = docs.limit(5)
    val copies = base
      .withColumn("doc_id", col("doc_id") + 100000) // identical text
    val pairs = Dedup.ngramNearDups(base.union(copies), "doc_id", "text",
      "lang", 3, 0.99)
    // every base doc pairs with its copy
    assert(pairs.count() >= 5)
    assert(pairs.filter(col("jaccard") === 1.0).count() >= 5)
  }

  test("ngram near-dups with PER-BLOCK ids: gram attach joins carry the " +
    "block, so a reused id scores against its own block's shingles") {
    import spark.implicits._
    // ids 1 and 2 exist in BOTH blocks with different texts: en 1≈2 are
    // near-dups, fr 1≈2 are near-dups, but en 1 vs fr 2 share nothing
    val d = Seq(
      ("en", 1L, "alpha beta gamma delta epsilon zeta"),
      ("en", 2L, "alpha beta gamma delta epsilon eta"),
      ("fr", 1L, "un deux trois quatre cinq six"),
      ("fr", 2L, "un deux trois quatre cinq sept"))
      .toDF("lang", "doc_id", "text")
    val pairs = Dedup.ngramNearDups(d, "doc_id", "text", "lang", 2, 0.5)
      .select("block", "id_a", "id_b", "jaccard")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // exactly one pair per block — an id-only attach join would emit the
    // (1,2) pair twice per block (once per wrong-block gram set)
    assert(pairs.sorted.toSeq == Seq(("en", 1L, 2L), ("fr", 1L, 2L)),
      s"got ${pairs.toSeq}")
  }

  test("token/shingle id interning is collision-free and size-faithful on the fixtures") {
    val docs3 = Tables.documents(spark, sfDir)
    // per-doc: id-set size == string-set size (what the oracles rely on)
    val bad = docs3.select(
        size(Dedup.tokenIds(col("text"))).as("ids1"),
        size(array_distinct(split(col("text"), " "))).as("str1"),
        size(Dedup.gramIds(col("text"), 3)).as("ids3"),
        size(Dedup.ngrams(col("text"), 3)).as("str3"))
      .filter(col("ids1") =!= col("str1") || col("ids3") =!= col("str3"))
    assert(bad.count() == 0)
    // corpus-wide: distinct ids == distinct strings (cross-doc collisions)
    val toks = docs3.select(explode(split(col("text"), " ")).as("t"))
    val ids = docs3.select(explode(Dedup.tokenIds(col("text"))).as("h"))
    assert(toks.select("t").distinct().count() ==
      ids.select("h").distinct().count())
    val grams = docs3.select(explode(Dedup.ngrams(col("text"), 3)).as("g"))
    val gids = docs3.select(explode(Dedup.gramIds(col("text"), 3)).as("h"))
    assert(grams.select("g").distinct().count() ==
      gids.select("h").distinct().count())
  }

  test("incremental near-dedup: prefix filter finds exactly the brute-force hits") {
    val docs = Tables.documents(spark, sfDir)
    val srcNum = substring(col("source"), 4, 10).cast("int")
    val corpus = docs.filter(srcNum < 10)
    val batch = docs.filter(srcNum >= 10)
    val survivors = Dedup.incrementalNearDedup(corpus, batch,
        "doc_id", "text", "lang", n = 3, threshold = 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // brute force on the fixture: full corpus×batch jaccard per lang
    val gc = corpus.select(col("lang"), col("doc_id").as("cid"),
      Dedup.gramIds(col("text"), 3).as("gc"))
    val gn = batch.select(col("lang"), col("doc_id").as("nid"),
      Dedup.gramIds(col("text"), 3).as("gn"))
    val bruteHits = gn.join(gc, "lang")
      .filter(size(col("gn")) + size(col("gc")) > 0)
      .filter(Dedup.jaccardSortedIds(col("gc"), col("gn")) >= 0.4)
      .select("nid").distinct().collect().map(_.getLong(0)).toSet
    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == batchIds -- bruteHits,
      s"survivors=${survivors.size} batch=${batchIds.size} hits=${bruteHits.size}")
    assert(bruteHits.nonEmpty, "fixture should contain at least one cross-set hit")
  }

  test("embedding near-dups exclude self and respect threshold") {
    val emb = Tables.embeddings(spark, sfDir)
    val out = Dedup.embeddingNearDups(emb, "vec_id", "embedding", "label", 0.99)
    assert(out.filter(col("id_a") === col("id_b")).count() == 0)
    assert(out.filter(col("cos_sim") < 0.99).count() == 0)
  }
}

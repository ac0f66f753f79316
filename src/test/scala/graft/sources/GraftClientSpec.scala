package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class GraftClientSpec extends SparkSpec {

  private def client = new GraftClient(spark, sfDir)

  test("client.list mirrors the catalog") {
    assert(client.list.count() >= 10)
  }

  test("dataFor with no params returns the full table") {
    assert(client.dataFor("nation").count() == 25)
  }

  test("dataFor by catalog index round-trips the printed listing") {
    // the reference addressed datasets by position in the printed catalog
    // (c.data_for(<index>), SURVEY §3.1); index i = row i of client.list
    val names = client.list.select("table").collect().map(_.getString(0))
    names.zipWithIndex.foreach { case (name, i) =>
      assert(client.dataFor(i).columns.toSeq ==
        client.dataFor(name).columns.toSeq, s"index $i != table $name")
    }
    val iNation = names.indexOf("nation")
    assert(client.dataFor(iNation).count() == 25)
    // params flow through the index form identically
    assert(client.dataFor(iNation, SoqlParams(limit = Some(3))).count() == 3)
    intercept[IllegalArgumentException](client.dataFor(names.length))
    intercept[IllegalArgumentException](client.dataFor(-1))
  }

  test("$select/$where/$order/$limit translate to the DataFrame ops") {
    val got = client.dataFor("orders", SoqlParams(
      select = Seq("o_orderkey", "round(o_totalprice, 2) as price"),
      where = Some("o_orderstatus = 'P'"),
      order = Seq("price desc", "o_orderkey"),
      limit = Some(10)))
    val want = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "P")
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("price").desc, col("o_orderkey"))
      .limit(10)
    assert(got.collect().toSeq == want.collect().toSeq)
  }

  test("$group/$having aggregate path") {
    val got = client.dataFor("orders", SoqlParams(
      select = Seq("o_orderstatus", "count(1) as n"),
      group = Seq("o_orderstatus"),
      having = Some("n > 10"),
      order = Seq("o_orderstatus")))
    val want = Tables.orders(spark, sfDir)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .filter(col("n") > 10).orderBy("o_orderstatus")
    assert(got.collect().toSeq == want.collect().toSeq)
  }

  test("$offset pages through a stable order") {
    val p1 = client.dataFor("nation", SoqlParams(
      select = Seq("n_nationkey"), order = Seq("n_nationkey"), limit = Some(5)))
    val p2 = client.dataFor("nation", SoqlParams(
      select = Seq("n_nationkey"), order = Seq("n_nationkey"),
      offset = Some(5), limit = Some(5)))
    val keys = (p1.collect() ++ p2.collect()).map(_.getInt(0)).toSeq
    assert(keys == (0 until 10))
  }

  test("$q searches every text column conjunctively") {
    val got = client.dataFor("documents", SoqlParams(q = Some("join filter")))
    val want = Tables.documents(spark, sfDir)
      .filter(array_contains(split(col("text"), " "), "join") &&
        array_contains(split(col("text"), " "), "filter"))
    assert(got.count() == want.count())
    assert(client.dataFor("documents",
      SoqlParams(q = Some("zz_nonexistent"))).count() == 0)
  }

  test("$q with qRanked returns matches in q95's tf-idf relevance order") {
    val got = client.dataFor("documents",
      SoqlParams(q = Some("join filter"), qRanked = true))
    // same schema as the unranked surface — score stays internal
    assert(got.schema == Tables.documents(spark, sfDir).schema)
    val gotIds = got.select("doc_id").collect().map(_.getLong(0)).toSeq
    // reference ranking: the declared q95 query on the same corpus
    val q95 = graft.operators.PipelineQueries
      .q95_fulltext_ranked(spark, sfDir)
      .select(col("doc_id"), col("score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(gotIds.toSet == q95.map(_._1).toSet, "match sets differ")
    // client order is non-increasing in q95's score (ties may permute —
    // the client tie-breaks on a row hash, q95 on doc_id)
    val scoreOf = q95.toMap
    val scores = gotIds.map(scoreOf)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "ranked $q order disagrees with q95 scores")
  }

  test("$q with qScorer=bm25 returns matches in q130's BM25 order") {
    // project to the text column first: the client scores the CONCATENATED
    // bag of all string columns, and BM25 (unlike tf-idf) is
    // length-normalized, so lang/source tokens would legitimately shift
    // scores relative to the text-only q130
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val got = Soql(docs,
      SoqlParams(q = Some("scan merge"), qRanked = true, qScorer = "bm25"))
    assert(got.schema == docs.schema)
    val gotIds = got.select("doc_id").collect().map(_.getLong(0)).toSeq
    val q130 = graft.operators.PipelineQueries
      .q130_bm25_ranked(spark, sfDir)
      .select(col("doc_id"), col("score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(gotIds.toSet == q130.map(_._1).toSet, "match sets differ")
    val scoreOf = q130.toMap
    val scores = gotIds.map(scoreOf)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "bm25 $q order disagrees with q130 scores")
    intercept[IllegalArgumentException] {
      Soql(Tables.documents(spark, sfDir),
        SoqlParams(q = Some("scan"), qRanked = true, qScorer = "pagerank"))
    }
  }

  test("ranked $q keeps fully-duplicate rows as independent matches") {
    // regression (round-4 advice): a pure row-content-hash id merged
    // duplicate rows into one tf bag, inflating their score and collapsing
    // their multiplicity. Ids are now hash + per-bucket row_number.
    import spark.implicits._
    val dup = Seq(
      (1L, "alpha join filter"), (1L, "alpha join filter"),
      (2L, "beta join"), (3L, "gamma"))
      .toDF("id", "text")
    val got = Soql(dup, SoqlParams(q = Some("join"), qRanked = true))
    assert(got.count() == 3, "both duplicate rows and the single match survive")
    assert(got.filter(col("id") === 1L).count() == 2)
    // duplicates must score like a single copy: they rank together with
    // rows of identical content, not above them
    assert(got.filter(col("id") === 3L).count() == 0)
  }

  test("paged fetch loop delivers every row exactly once and terminates") {
    val pages = client.fetchPages("nation",
      SoqlParams(order = Seq("n_nationkey")), pageSize = 7).toSeq
    // 25 rows / 7 per page → 3 full pages + 1 short page of 4
    assert(pages.length == 4)
    assert(pages.map(_.count()) == Seq(7L, 7L, 7L, 4L))
    val keys = pages.flatMap(_.select("n_nationkey").collect())
      .map(_.getInt(0))
    assert(keys == (0 until 25), "pages must tile the ordered table exactly")
    // page-size divides row count → an extra empty page terminates the loop
    val even = client.fetchPages("nation",
      SoqlParams(order = Seq("n_nationkey")), pageSize = 25).toSeq
    assert(even.map(_.count()) == Seq(25L, 0L))
    // unordered paging is refused (SODA's documented stability contract)
    intercept[IllegalArgumentException] {
      client.fetchPages("nation", SoqlParams(), pageSize = 7)
    }
    // fetchAll re-unions the loop into the full table
    assert(client.fetchAll("nation",
      SoqlParams(order = Seq("n_nationkey")), pageSize = 7).count() == 25)
  }

  test("$q on a table with NO text columns matches nothing (not everything)") {
    import spark.implicits._
    val allNum = Seq((1L, 2.0), (3L, 4.0)).toDF("a", "b")
    // SODA $q searches text fields; with none present the truthful match
    // set is empty — both ranked and unranked surfaces
    assert(Soql(allNum, SoqlParams(q = Some("anything"))).count() == 0)
    assert(Soql(allNum,
      SoqlParams(q = Some("anything"), qRanked = true)).count() == 0)
  }

  test("ranked $q on a table that already owns a 'score' column neither " +
    "crashes nor eats the caller's column") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta", 0.25), (2L, "alpha alpha beta", 0.5),
      (3L, "gamma", 0.75)).toDF("id", "text", "score")
    val got = Soql(df, SoqlParams(q = Some("alpha"), qRanked = true))
    assert(got.columns.toSeq == Seq("id", "text", "score"),
      s"schema mangled: ${got.columns.toSeq}")
    val byId = got.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // the surviving 'score' values are the CALLER's, not tf-idf's
    assert(byId == Map(1L -> 0.25, 2L -> 0.5))
  }

  test("fetchPages.next() past the final page throws NoSuchElementException") {
    val it = client.fetchPages("nation",
      SoqlParams(order = Seq("n_nationkey")), pageSize = 25)
    it.next(); it.next()          // 25-row page, then the empty terminator
    assert(!it.hasNext)
    intercept[NoSuchElementException] { it.next() }
  }

  test("unknown table falls back to schema-on-file parquet") {
    assert(client.dataFor("region").schema == Tables.regionSchema)
    intercept[Exception] {
      client.dataFor("not_a_table").collect()
    }
  }

  test("graft SQL functions compose with $select/$where strings") {
    graft.plans.GraftExtensions.register(spark)
    // a SoQL-style request using graft's registered functions: a stable
    // content-hash sample in $where and custom sketches in $select
    val got = client.dataFor("documents", SoqlParams(
      select = Seq("doc_id", "simhash60(text) as sh",
        "size(winnow_ids(text, 3, 4)) as n_fp"),
      where = Some("hash_sample(doc_id, 0.5) and lang = 'es'"),
      order = Seq("doc_id")))
    val expected = graft.Tables.documents(spark, sfDir)
      .filter(graft.functions.Sampling.hashSample(col("doc_id"), 0.5) &&
        col("lang") === "es")
      .select(col("doc_id"),
        graft.expressions.SimHash60.simhash60(col("text")).as("sh"),
        size(graft.expressions.WinnowIds.winnowIds(col("text"), 3, 4))
          .as("n_fp"))
      .orderBy(col("doc_id"))
    assert(got.collect().toSeq == expected.collect().toSeq)
    assert(got.count() > 0)
  }
}

package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace vs BPE-ish regex") {
    val df = Seq("hello world42 foo-bar").toDF("t").select(
      TextFunctions.tokenCountWs(col("t")).as("ws"),
      TextFunctions.tokenCountRegex(col("t")).as("re")).collect().head
    assert(df.getInt(0) == 3)
    // hello | world | 42 | foo | - | bar
    assert(df.getInt(1) == 6)
  }

  test("quality score is within [0,1] over the corpus and deterministic") {
    val stop = Seq("join", "filter", "scan")
    val q = Tables.documents(spark, sfDir).select(
      TextFunctions.qualityScore(col("text"), stop).as("q"))
    assert(q.filter(col("q") < 0.0 || col("q") > 1.0).count() == 0)
    val a = q.agg(sum("q")).head.getDouble(0)
    val b = q.agg(sum("q")).head.getDouble(0)
    assert(a == b)
  }

  test("fingerprint: equal for identical token sequences, order-sensitive") {
    val df = Seq(
      ("a b c", "a b c"),
      ("a b c", "c b a")).toDF("x", "y").select(
      TextFunctions.fingerprint(col("x")).as("fx"),
      TextFunctions.fingerprint(col("y")).as("fy")).collect()
    assert(df(0).getLong(0) == df(0).getLong(1))
    assert(df(1).getLong(0) != df(1).getLong(1))
  }

  test("full-text search is conjunctive ($q analog)") {
    val docs = Seq(
      (1L, "scan filter join"),
      (2L, "scan window sort"),
      (3L, "filter join scan extra")).toDF("doc_id", "text")
    val hits = TextFunctions.fullTextSearch(docs, "text", "scan filter")
      .select("doc_id").as[Long].collect().toSet
    assert(hits == Set(1L, 3L))
    assert(TextFunctions.fullTextSearch(docs, "text", "absent").count() == 0)
  }

  test("stopword and punct ratios behave on crafted input") {
    val r = Seq("the cat, the dog!").toDF("t").select(
      TextFunctions.stopwordRatio(col("t"), Seq("the")).as("sw"),
      TextFunctions.punctRatio(col("t")).as("p")).collect().head
    // tokens: the | cat, | the | dog! → 'the' twice of 4
    assert(r.getDouble(0) == 0.5)
    assert(r.getDouble(1) > 0.0 && r.getDouble(1) < 0.3)
  }

  test("ranked full-text search orders by TF-IDF with doc_id tie-break") {
    // corpus of 4 docs; query terms: 'scan' (df=3) and 'rare' (df=2)
    val docs = Seq(
      (1L, "scan rare rare other"),   // tf(scan)=1, tf(rare)=2
      (2L, "scan rare other other"),  // tf(scan)=1, tf(rare)=1
      (3L, "scan scan other other"),  // no 'rare' → filtered out
      (4L, "other other other other")).toDF("doc_id", "text")
    val out = TextFunctions.fullTextSearchRanked(docs, "doc_id", "text",
      "scan rare").select("doc_id", "score").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L),
      "conjunctive match must keep docs 1,2 ordered by score")
    // hand-computed: score = tf_scan·ln(4/3) + tf_rare·ln(4/2)
    val s1 = 1 * math.log(4.0 / 3) + 2 * math.log(4.0 / 2)
    val s2 = 1 * math.log(4.0 / 3) + 1 * math.log(4.0 / 2)
    assert(math.abs(out(0).getDouble(1) - s1) < 1e-12)
    assert(math.abs(out(1).getDouble(1) - s2) < 1e-12)
    // tie-break: identical texts rank by doc_id ascending
    val tied = Seq((9L, "scan rare"), (3L, "scan rare")).toDF("doc_id", "text")
    val t = TextFunctions.fullTextSearchRanked(tied, "doc_id", "text",
      "scan rare").select("doc_id").as[Long].collect().toSeq
    assert(t == Seq(3L, 9L))
  }

  test("bm25 saturates term frequency and normalizes for document length") {
    // 4 docs, query 'scan rare'; doc 3 has no 'rare' → filtered; doc 4 is
    // doc 2's text padded to 2x length (same tf) → must score LOWER
    val docs = Seq(
      (1L, "scan rare rare other"),
      (2L, "scan rare other other"),
      (3L, "scan scan other other"),
      (4L, "scan rare other other pad pad pad pad")).toDF("doc_id", "text")
    val out = TextFunctions.bm25Ranked(docs, "doc_id", "text", "scan rare")
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L, 4L))
    assert(out(1L) > out(2L), "higher tf(rare) must rank higher")
    assert(out(2L) > out(4L), "same tf in a longer doc must rank lower")
    // saturation: doubling tf(rare) (doc1 vs doc2) must gain LESS than the
    // raw-tf doubling a linear TF-IDF would give
    val tfidf = TextFunctions
      .fullTextSearchRanked(docs, "doc_id", "text", "scan rare")
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) / out(2L) < tfidf(1L) / tfidf(2L),
      "bm25 must saturate tf relative to linear tf-idf")
  }

  test("langId without an id column is deterministic across partitionings " +
    "(no monotonically_increasing_id)") {
    val docs = Tables.documents(spark, sfDir)
    def run(d: org.apache.spark.sql.DataFrame) =
      TextFunctions.langId(d, docs, "text", "lang")
        .select("doc_id", "pred_lang", "lang_overlap").collect().toSet
    // same data, three different physical layouts → identical output
    val base = run(docs)
    assert(run(docs.repartition(7, col("lang"))) == base)
    assert(run(docs.repartition(13).sortWithinPartitions(col("n_chars").desc))
      == base)
  }

  test("scrubPii redacts each shape to its typed tag, in precedence order") {
    import spark.implicits._
    val rows = Seq(
      (1L, "contact bob.smith+x@corp.example.org or jane@sub.dom.io today"),
      (2L, "server at 192.168.1.200 answered"),
      (3L, "ssn 123-45-6789 on file"),
      (4L, "card 4111 1111 1111 1111 or 4111111111111111 works"),
      (5L, "call +1 (808) 555-0123 or 808-555-0199"),
      (6L, "no pii here, just text with numbers 42 and 7"),
      (7L, "mixed: a@b.co at 10.0.0.1, ssn 000-11-2222, dial 222-333-4444"))
      .toDF("id", "text")
    val got = rows.select(col("id"),
      TextFunctions.scrubPii(col("text")).as("clean"),
      TextFunctions.piiCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1L)._1 == "contact [EMAIL] or [EMAIL] today" && got(1L)._2 == 2)
    assert(got(2L)._1 == "server at [IP] answered" && got(2L)._2 == 1)
    assert(got(3L)._1 == "ssn [SSN] on file" && got(3L)._2 == 1)
    assert(got(4L)._1 == "card [CARD] or [CARD] works" && got(4L)._2 == 2)
    assert(got(5L)._1 == "call [PHONE] or [PHONE]" && got(5L)._2 == 2)
    assert(got(6L)._1 == rows.filter(col("id") === 6).select("text")
      .first().getString(0) && got(6L)._2 == 0)   // untouched
    assert(got(7L)._1 == "mixed: [EMAIL] at [IP], ssn [SSN], dial [PHONE]"
      && got(7L)._2 == 4)
    // idempotent: a scrubbed doc re-scrubs to itself
    val twice = rows.select(col("id"),
      TextFunctions.scrubPii(TextFunctions.scrubPii(col("text"))).as("c2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.forall { case (id, (clean, _)) => twice(id) == clean })
  }

  test("scrubPii leaves long digit runs whole: no partial [PHONE] bite " +
    "out of a >16-digit tracking number") {
    import spark.implicits._
    val rows = Seq(
      (1L, "tracking 12345678901234567 en route"),        // 17 digits
      (2L, "serial 123456789012345678901 logged"),        // 21 digits
      (3L, "call 5551234567 then 5559876543"),            // two bare phones
      (4L, "+15551234567 leading-plus phone"))
      .toDF("id", "text")
    val got = rows.select(col("id"),
      TextFunctions.scrubPii(col("text")).as("clean"),
      TextFunctions.piiCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // 17+ digit runs: too long for [CARD]'s \b…\b, and the phone guard
    // ([^0-9]|^) cannot start a match mid-run — untouched, count 0
    assert(got(1L) == (("tracking 12345678901234567 en route", 0L)))
    assert(got(2L) == (("serial 123456789012345678901 logged", 0L)))
    // real phones still redact, including at a guard-consumed separator
    // and at string start behind a '+'
    assert(got(3L) == (("call [PHONE] then [PHONE]", 2L)))
    assert(got(4L) == (("[PHONE] leading-plus phone", 1L)))
  }

  test("langId is deterministic, total, and lands in the label domain") {
    val docs = Tables.documents(spark, sfDir)
    val out = TextFunctions.langId(docs, docs, "text", "lang")
    assert(out.count() == docs.count())
    val langs = docs.select("lang").distinct().as[String].collect().toSet
    val preds = out.select("pred_lang").distinct().as[String].collect().toSet
    assert(preds.subsetOf(langs))
    // deterministic across runs
    val again = TextFunctions.langId(docs, docs, "text", "lang")
      .select("doc_id", "pred_lang").collect().toSet
    assert(again == out.select("doc_id", "pred_lang").collect().toSet)
  }
}

package graft.operators

import graft.SparkSpec
import graft.functions.Dedup
import org.apache.spark.sql.functions._

class PrefixDupSpec extends SparkSpec {
  import spark.implicits._

  // the REAL q115 core (range buckets + boundary stitching), over an
  // arbitrary frame for edge-case control; small bucket counts force
  // cross-boundary adjacency through the stitch path
  private def flagged(texts: Seq[String], buckets: Int = 4): Set[String] =
    Dedup.prefixFlags(
      texts.toDF("text").filter(length(col("text")) > 0)
        .select(col("text").as("t")).distinct(),
      buckets)
      .collect().map(_.getString(0)).toSet

  test("strict prefixes flagged; exact dups and non-prefixes are not") {
    val got = flagged(Seq(
      "alpha beta",            // prefix of "alpha beta gamma" → flagged
      "alpha beta gamma",
      "alpha beta gamma",      // exact dup of the above → NOT flagged
      "alphabet",              // shares chars but not a token-or-char prefix path: "alpha beta" < "alphabet"? ' '(0x20) < 'b' so sorted between — still correctly unflagged
      "zeta",                  // no extension → not flagged
      "ze",                    // prefix of zeta → flagged
      "q"))                    // singleton → not flagged
    assert(got == Set("alpha beta", "ze"))
  }

  test("transitive chains: every proper prefix in a chain is flagged") {
    val got = flagged(Seq("a", "a b", "a b c", "a b c d"))
    assert(got == Set("a", "a b", "a b c"))
  }

  test("the adjacency argument holds with interleaved non-matching texts") {
    // "ab" is a prefix of "abz"; "ac..." sorts BETWEEN them? No: 'c' > 'b'
    // puts it after — the range argument the operator relies on
    val got = flagged(Seq("ab", "abz", "ac middle text", "abq"))
    // "ab" < "abq" < "abz" — ab's successor is abq (extension) → flagged
    assert(got == Set("ab"))
  }

  test("boundary stitching: a 200-link prefix chain where EVERY adjacent " +
    "pair is a prefix pair survives any bucket-boundary placement") {
    // s_i = "a"*i — sorted order is i ascending, every adjacent pair is a
    // prefix pair, and all texts share the first character (the exact
    // corpus the old first-char blocking serialized into one task). With
    // 8 buckets, ~7 prefix pairs straddle bucket boundaries — ANY missed
    // stitch loses a flag and fails the equality below.
    val chain = (1 to 200).map("a" * _)
    val got = flagged(scala.util.Random.shuffle(chain), buckets = 8)
    assert(got == chain.dropRight(1).toSet,
      s"missed ${(chain.dropRight(1).toSet -- got).map(_.length).toSeq.sorted}")
  }

  test("all-same-first-char corpus spreads across buckets (the skew " +
    "shape that collapsed first-char blocking to one task)") {
    val texts = (1 to 1000).map(i => f"the common crawl boilerplate $i%04d")
    val bucketed = Dedup.prefixBuckets(texts.toDF("t"), 8)
    val used = bucketed.select("b").distinct().count()
    assert(used >= 4,
      s"literal cut points left a hot single bucket: $used of 8 used")
    // and the operator still answers correctly on that corpus
    val withPrefix = texts :+ "the common crawl boilerplate 0007 extended"
    assert(flagged(withPrefix, buckets = 8) ==
      Set("the common crawl boilerplate 0007"))
  }

  test("bucket ids are a pure function of the text: any two " +
    "materializations agree (the stitch's correctness precondition, " +
    "formerly carried by exchange reuse)") {
    val texts = scala.util.Random.shuffle((1 to 500).map("x" * _)).toDF("t")
    val a = Dedup.prefixBuckets(texts, 8)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val b = Dedup.prefixBuckets(texts.repartition(13), 8)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(a == b, "bucket assignment depends on physical layout")
    // contiguity/monotonicity: sorting by (b, t) IS sorting by t
    val byBT = a.toSeq.sortBy { case (t, bk) => (bk, t) }.map(_._1)
    assert(byBT == a.keys.toSeq.sorted)
  }

  test("randomized brute-force equivalence: flags == {t | ∃u≠t: u " +
    "startsWith t}, across corpora shapes and bucket counts") {
    val rnd = new scala.util.Random(20260815L)
    (1 to 6).foreach { trial =>
      // corpora engineered for heavy shared prefixes: small alphabet,
      // repeated extension, plus plain random strings
      val alphabet = "abct "
      def randStr(n: Int) =
        (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val seeds = (1 to 30).map(_ => randStr(1 + rnd.nextInt(6)))
      val extended = seeds.flatMap(s =>
        (0 until rnd.nextInt(4)).scanLeft(s)((acc, _) =>
          acc + randStr(1 + rnd.nextInt(3))))
      val corpus = (seeds ++ extended ++ (1 to 20).map(_ =>
        randStr(1 + rnd.nextInt(10)))).filter(_.nonEmpty).distinct
      val expect = corpus.filter(t =>
        corpus.exists(u => u != t && u.startsWith(t))).toSet
      val buckets = 1 + rnd.nextInt(9) // incl. the 1-bucket degenerate
      val got = flagged(scala.util.Random.shuffle(corpus), buckets)
      assert(got == expect,
        s"trial $trial buckets=$buckets: missed=${expect -- got} " +
          s"extra=${got -- expect}")
    }
  }

  test("supplementary-plane corpus: emoji (U+1F600) and BMP-tail " +
    "(U+E000/U+FFFD) texts coexist — cut order must be UTF-8, " +
    "not UTF-16 (.sorted cuts silently lose flags here)") {
    // Under UTF-16 code units 😀 (D83D DE00) < U+E000; under UTF-8 bytes
    // (what Spark's sort and SortedLowerBound compare) 😀 > U+FFFD >
    // U+E000. A corpus saturating the cut sample with both families
    // makes at least one cut land in the divergence zone; prefix chains
    // inside each family then catch any non-monotone bucket assignment
    // as a MISSING flag (the advisor's false-negative class).
    val emoji = (1 to 120).map("\ud83d\ude00" * _)
    val pua = (1 to 120).map("\ue000" * _)
    val repl = (1 to 120).map("\ufffd" * _)
    val corpus = emoji ++ pua ++ repl
    val expectFlags = (emoji.dropRight(1) ++ pua.dropRight(1) ++
      repl.dropRight(1)).toSet
    (2 to 9).foreach { buckets =>
      val got = flagged(scala.util.Random.shuffle(corpus), buckets)
      assert(got == expectFlags,
        s"buckets=$buckets: missed=${(expectFlags -- got).size} " +
          s"extra=${(got -- expectFlags).size}")
    }
    // the fix's direct pin: cuts come out sorted under the UTF-8
    // comparator (SortedLowerBound's precondition), and the assigned
    // bucket is exactly count(cuts <= t) under that order \u2014 UTF-16
    // .sorted cuts fail BOTH on this corpus (the families transpose)
    val ord = graft.expressions.SortedLowerBound.utf8Ordering
    val df = corpus.toDF("t")
    val cuts = Dedup.prefixCuts(df, buckets = 8, sampleN = 256)
    assert(cuts.toSeq == cuts.sorted(ord).toSeq,
      s"cuts not UTF-8-sorted: ${cuts.mkString(",")}")
    assert(cuts.sameElements(cuts.distinct))
    val got = Dedup.prefixBuckets(df, 8)
      .collect().map(r => r.getString(0) -> r.getInt(1))
    got.foreach { case (t, b) =>
      assert(b == cuts.count(c => ord.compare(c, t) <= 0),
        s"bucket of ${t.length}-char text != count(cuts <= t) under UTF-8")
    }
  }

  test("q115 steady-state plan: ONE corpus scan (the join-back), both " +
    "flag branches read the materialized (t, b) artifact, no distinct " +
    "aggregation over the corpus, no sampled range exchange") {
    val sfDir = "/root/testdata/sf0.001"
    // AQE's toString dumps Final AND Initial plans — count in the final
    // section only, or every scan double-counts
    def finalPlan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val df = graft.operators.CorpusQueries.q115_dedup_prefix(spark, sfDir)
    df.collect() // builds the artifact (once) and finalizes AQE
    val plan = finalPlan(df)
    // the round-9 materialize-once contract: the distinct text
    // aggregation and the driver cut sample live in the artifact BUILD,
    // not in the per-invocation plan — both the lead-window branch and
    // the stitch branch scan the textcache parquet artifact
    assert(plan.contains("graft-textcache-"),
      s"flag branches must read the materialized artifact:\n$plan")
    val corpusScans = "documents\\.parquet".r.findAllIn(plan).size
    assert(corpusScans == 1,
      s"expected exactly one corpus scan (the join-back), got " +
        s"$corpusScans:\n$plan")
    // the output orderBy(doc_id) is a legitimate range exchange; the
    // hazard class is a sampled range exchange over the TEXT (two
    // consumers sampling boundaries independently)
    assert(!"rangepartitioning\\((t|text)#".r.findFirstIn(plan).isDefined,
      s"sampled range exchange over the text reintroduced:\n$plan")
    // re-invocation reuses the artifact: the second plan is also
    // single-corpus-scan (nothing rebuilt, no extra actions)
    val df2 = graft.operators.CorpusQueries.q115_dedup_prefix(spark, sfDir)
    df2.collect()
    val plan2 = finalPlan(df2)
    assert("documents\\.parquet".r.findAllIn(plan2).size == 1 &&
      plan2.contains("graft-textcache-"))
  }

  test("plan pin: no sampled range exchange anywhere (literal cuts), " +
    "the window runs on a hash exchange over b, and no single-partition " +
    "corpus-sized sort") {
    val df = Dedup.prefixFlags(
      (1 to 500).map("x" * _).toDF("t"), buckets = 8)
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("rangepartitioning"),
      s"a sampled range exchange reintroduces the boundary-agreement " +
        s"hazard:\n$plan")
    assert("hashpartitioning\\(b#".r.findFirstIn(plan).isDefined,
      s"window's bucket exchange missing:\n$plan")
    // the corpus-sized lead must be partitioned by b — a window spec
    // that ORDERS by t with no partition column is the one-task shape
    // (the <=buckets-row stitch frame's single-partition lead over b is
    // fine: its input is bounded by the bucket knob, not the corpus)
    assert(!plan.contains("windowspecdefinition(t#"),
      s"unpartitioned corpus-sized window over t:\n$plan")
  }
}

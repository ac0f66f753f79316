package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic pins for the q116 temperature mix and q117 span masking —
  * the properties that must survive refactors independent of the DuckDB
  * hash gate.
  */
class MixMaskSpec extends SparkSpec {

  test("q116: α=0.5 shares sum to ~1e6 ppm and move every source toward uniform") {
    val rows = CorpusQueries.q116_mix_temperature(spark, sfDir).collect()
    assert(rows.length == 20)
    val before = rows.map(_.getAs[Long]("share_before_ppm"))
    val after = rows.map(_.getAs[Long]("share_after_ppm"))
    // integer-floor shares: sum within |sources| ppm of exactly 1e6
    assert(math.abs(before.sum - 1000000L) <= rows.length)
    assert(math.abs(after.sum - 1000000L) <= rows.length)
    val uniform = 1000000L / rows.length
    // temperature < 1 contracts toward uniform: no source's share moves
    // AWAY from 50000 ppm (ties at the fixture's near-uniform mix allowed)
    rows.foreach { r =>
      val b = r.getAs[Long]("share_before_ppm")
      val a = r.getAs[Long]("share_after_ppm")
      assert(math.abs(a - uniform) <= math.abs(b - uniform) + 1,
        s"${r.getAs[String]("source")}: $b -> $a moved away from uniform")
    }
    // boost direction: under-represented sources get boost > 1000 milli
    rows.filter(_.getAs[Long]("share_before_ppm") < uniform - 1000)
      .foreach(r => assert(r.getAs[Long]("boost_milli") > 1000L))
  }

  test("q117: mask rate lands near 15% and unmasked tokens are verbatim") {
    val out = CorpusQueries.q117_span_mask(spark, sfDir)
    val tot = out.agg(sum("n_tok").as("t"), sum("n_masked").as("m"))
      .collect()(0)
    val rate = tot.getAs[Long]("m").toDouble / tot.getAs[Long]("t")
    assert(rate > 0.12 && rate < 0.18, s"mask rate $rate out of band")
    // reconstruction: replacing each doc's masked slots in the original
    // token stream reproduces masked_text exactly (order + verbatim
    // pass-through of unmasked tokens)
    val joined = Tables.documents(spark, sfDir)
      .join(out, "doc_id")
      .select(col("doc_id"), split(col("text"), " ").as("orig"),
        split(col("masked_text"), " ").as("got"), col("n_masked"))
      .collect()
    assert(joined.length == 500)
    joined.foreach { r =>
      val orig = r.getSeq[String](1)
      val got = r.getSeq[String](2)
      assert(orig.length == got.length, s"doc ${r.getLong(0)} length drift")
      val masked = orig.zip(got).count { case (o, g) => o != g }
      // every differing slot must be the mask token, and the count must
      // equal the reported n_masked (unless an original token WAS the
      // literal mask string — absent from these fixtures)
      orig.zip(got).foreach { case (o, g) =>
        assert(o == g || g == "<mask>", s"doc ${r.getLong(0)}: $o -> $g")
      }
      assert(masked <= r.getAs[Long]("n_masked"))
    }
  }
}

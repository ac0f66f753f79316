package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The histogram + crossing-rule percentile must reproduce Spark's
  * `percentile()` BIT-FOR-BIT — q27/q136's oracle hashes were earned
  * against the object-buffer aggregate, so the scale-safe rewrite has to
  * yield the identical doubles (same bracketing values, same IEEE
  * interpolation ops in the same order), not merely close ones.
  */
class ExactPercentileSpec extends SparkSpec {

  test("matches percentile() bit-for-bit on events.value (doubles)") {
    val ev = Tables.events(spark, sfDir).select(col("event_type"), col("value"))
    val ps = Seq(0.5, 0.9, 0.99, 0.25, 0.0, 1.0)
    val want = ev.groupBy(col("event_type"))
      .agg(ps.map(p => expr(s"percentile(value, $p)").as("p" + p.toString.replace(".", "_"))).head,
        ps.tail.map(p => expr(s"percentile(value, $p)").as("p" + p.toString.replace(".", "_"))): _*)
      .orderBy(col("event_type")).collect()
    val got = ExactPercentile.of(ev, Seq("event_type"), "value",
        ps.map(p => p -> ("p" + p.toString.replace(".", "_"))))
      .orderBy(col("event_type")).collect()
    assert(got.length == want.length && got.nonEmpty)
    want.zip(got).foreach { case (w, g) =>
      assert(w.getString(0) == g.getString(0))
      ps.indices.foreach { i =>
        val (wd, gd) = (w.getDouble(i + 1), g.getDouble(i + 1))
        assert(java.lang.Double.doubleToLongBits(wd) ==
          java.lang.Double.doubleToLongBits(gd),
          s"type=${w.getString(0)} p=${ps(i)}: percentile()=$wd hist=$gd")
      }
    }
  }

  test("matches percentile() bit-for-bit on integer cents (longs)") {
    val cents = Tables.events(spark, sfDir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val ps = Seq(0.05, 0.5, 0.95)
    val want = cents.groupBy(col("event_type"))
      .agg(ps.map(p => expr(s"percentile(cents, $p)").as("p" + p.toString.replace(".", "_"))).head,
        ps.tail.map(p => expr(s"percentile(cents, $p)").as("p" + p.toString.replace(".", "_"))): _*)
      .orderBy(col("event_type")).collect()
    val hist = cents.groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
    val got = ExactPercentile.fromHistogram(hist, Seq("event_type"),
        "cents", "cnt", ps.map(p => p -> ("p" + p.toString.replace(".", "_"))))
      .orderBy(col("event_type")).collect()
    want.zip(got).foreach { case (w, g) =>
      ps.indices.foreach { i =>
        assert(java.lang.Double.doubleToLongBits(w.getDouble(i + 1)) ==
          java.lang.Double.doubleToLongBits(g.getDouble(i + 1)),
          s"type=${w.getString(0)} p=${ps(i)}")
      }
    }
  }

  test("edge shapes: single row, two rows, ties, weighted histogram") {
    import spark.implicits._
    val df = Seq(
      ("a", 10L), ("b", 1L), ("b", 2L),
      ("c", 5L), ("c", 5L), ("c", 5L), ("c", 9L))
      .toDF("k", "v")
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
    val want = df.groupBy(col("k"))
      .agg(ps.map(p => expr(s"percentile(v, $p)").as("p" + p.toString.replace(".", "_"))).head,
        ps.tail.map(p => expr(s"percentile(v, $p)").as("p" + p.toString.replace(".", "_"))): _*)
      .orderBy(col("k")).collect()
    val got = ExactPercentile.of(df, Seq("k"), "v", ps.map(p => p -> ("p" + p.toString.replace(".", "_"))))
      .orderBy(col("k")).collect()
    want.zip(got).foreach { case (w, g) =>
      ps.indices.foreach { i =>
        assert(java.lang.Double.doubleToLongBits(w.getDouble(i + 1)) ==
          java.lang.Double.doubleToLongBits(g.getDouble(i + 1)),
          s"k=${w.getString(0)} p=${ps(i)}: ${w.getDouble(i + 1)} vs ${g.getDouble(i + 1)}")
      }
    }
  }

  test("null values are ignored, matching percentile()") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)))
      .toDF("k", "v")
    val got = ExactPercentile.of(df, Seq("k"), "v", Seq(0.5 -> "p50"))
      .collect()
    assert(got.head.getDouble(1) == 2.0)
  }
}

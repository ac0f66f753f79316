package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The binned point-in-interval join must (1) agree exactly with the naive
  * inequality join it replaces, for every bin width, (2) keep unmatched
  * points under how="left" even when a bin collision fails the exact range
  * check, and (3) plan as a shuffled equi-join — no nested-loop fallback.
  */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  // deterministic pseudo-random fixture: 3 keys, overlapping + empty +
  // null-bounded intervals, points on bin boundaries and far outside
  private def fixture: (DataFrame, DataFrame) = {
    val points = Seq(
      (1L, 0L), (1L, 9L), (1L, 10L), (1L, 11L), (1L, 99L), (1L, 100L),
      (2L, 10L), (2L, 50L), (2L, 1000L),
      (3L, 7L), (3L, -13L), (3L, -1L))
      .toDF("k", "at")
      .withColumn("pid", monotonically_increasing_id())
    val intervals = Seq(
      (1L, Some(0L), Some(10L)),    // [0,10) — catches 0,9 not 10
      (1L, Some(10L), Some(100L)),  // adjacent regime
      (1L, Some(5L), Some(5L)),     // empty — matches nothing
      (1L, Some(50L), Some(40L)),   // inverted — matches nothing
      (2L, Some(0L), Some(2000L)),  // long interval, many bins
      (2L, None, Some(100L)),       // null from — matches nothing
      (3L, Some(-20L), Some(0L)))   // negative instants
      .toDF("k", "from", "to")
      .withColumn("iid", monotonically_increasing_id())
    (points, intervals)
  }

  private def naive(points: DataFrame, intervals: DataFrame): Set[(Long, Long)] =
    points.join(intervals.filter(col("to") > col("from")),
        points("k") === intervals("k") &&
          points("at") >= intervals("from") && points("at") < intervals("to"))
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet

  test("binned join = naive inequality join for every bin width") {
    val (points, intervals) = fixture
    val expected = naive(points, intervals)
    for (w <- Seq(1L, 3L, 10L, 64L, 100000L)) {
      val got = RangeJoin.pointInInterval(points, intervals, Seq("k"),
          "at", "from", "to", binWidth = w)
        .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
      assert(got == expected, s"binWidth=$w")
    }
  }

  test("each point matches a containing interval exactly once (no bin dup)") {
    val (points, intervals) = fixture
    val dup = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "at", "from", "to", binWidth = 3)
      .groupBy(col("pid"), col("iid")).count().filter(col("count") > 1)
    assert(dup.isEmpty)
  }

  test("left join keeps unmatched points; bin-collide-but-miss still kept") {
    val (points, intervals) = fixture
    val left = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "at", "from", "to", binWidth = 1000, how = "left")
    // binWidth=1000 puts point (1, 100) in bin 0 with intervals it does
    // NOT fall in — it must survive with a null interval side
    assert(left.count() >= points.count())
    val unmatched = left.filter(col("iid").isNull)
      .select(col("k"), col("at")).as[(Long, Long)].collect().toSet
    assert(unmatched.contains((1L, 100L)))    // past every k=1 interval
    assert(!unmatched.contains((2L, 1000L)))  // inside [0, 2000) — matched
    assert(unmatched.contains((3L, 7L)))      // after [-20, 0)
  }

  test("plans a shuffled equi-join on (key, bin), not a nested loop") {
    val (points, intervals) = fixture
    val plan = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "at", "from", "to", binWidth = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("hot key: one user holding half the points still matches exactly") {
    // the skew shape AQE must be able to split: key 1 carries 5000 points
    // and 50 long overlapping intervals, 50 cold keys carry 100 each
    val points = ((1 to 5000).map(i => (1L, i.toLong * 7 % 10000)) ++
      (2 to 51).flatMap(k => (1 to 100).map(i => (k.toLong, i.toLong * 13))))
      .toDF("k", "at").withColumn("pid", monotonically_increasing_id())
    val intervals = ((1 to 50).map(i =>
      (1L, i.toLong * 100, i.toLong * 100 + 500)) ++
      (2 to 51).map(k => (k.toLong, 0L, 700L)))
      .toDF("k", "from", "to").withColumn("iid", monotonically_increasing_id())
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "at", "from", "to", binWidth = 250)
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
    assert(got == naive(points, intervals))
    assert(got.size > 10000, s"fixture too sparse: ${got.size}")
  }

  test("instants beyond 2^53 (epoch nanos) bin exactly — no double rounding") {
    // 1.8e18 is representable as long but not exactly as double; a
    // double-division floorDiv misbins some of these by one and silently
    // drops true matches
    val base = 1800000000000000000L
    val pts = (0 until 1000).map(i => (1L, base + i * 997L))
      .toDF("k", "at").withColumn("pid", monotonically_increasing_id())
    val ivs = (0 until 200).map(i =>
      (1L, base + i * 5003L, base + i * 5003L + 1000L))
      .toDF("k", "from", "to").withColumn("iid", monotonically_increasing_id())
    for (w <- Seq(1000L, 4096L, 1000000000L)) {
      val got = RangeJoin.pointInInterval(pts, ivs, Seq("k"),
          "at", "from", "to", binWidth = w)
        .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
      assert(got == naive(pts, ivs), s"binWidth=$w")
    }
  }

  test("rejects nonpositive bin widths and unknown join types") {
    val (points, intervals) = fixture
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "at", "from", "to", binWidth = 0)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "at", "from", "to", binWidth = 10, how = "full")
    }
  }
}

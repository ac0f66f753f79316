package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-PAV pins: equality with an in-JVM reference PAV on random
  * weighted inputs, monotone + calibrated invariants, and layout
  * independence (the fit is a pure function of the input multiset).
  */
class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  /** textbook sequential PAV over (x, y, w) triples, exact rationals */
  private def referencePav(rows: Seq[(Long, Long, Long)]): Map[Long, (Long, Long)] = {
    // reduce to per-x (Σwy, Σw), x ascending
    val red = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (x, rs) =>
      (x, BigInt(rs.map(r => r._2 * r._3).sum), BigInt(rs.map(_._3).sum))
    }
    var stack = List.empty[(List[Long], BigInt, BigInt)]
    red.foreach { case (x, swy, sw) =>
      var b = (List(x), swy, sw)
      while (stack.nonEmpty && stack.head._2 * b._3 > b._2 * stack.head._3) {
        val l = stack.head; stack = stack.tail
        b = (l._1 ::: b._1, l._2 + b._2, l._3 + b._3)
      }
      stack = b :: stack
    }
    stack.flatMap { case (xs, swy, sw) =>
      val g = swy.gcd(sw)
      xs.map(x => x -> (swy / g).longValue -> (sw / g).longValue)
    }.map { case ((x, n), d) => x -> (n, d) }.toMap
  }

  private def fitMap(rows: Seq[(Long, Long, Long)], parts: Int): Map[Long, (Long, Long)] =
    Isotonic.fit(rows.toDF("x", "y", "w").repartition(parts), "x", "y", "w")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("already-isotonic input is returned unchanged (each x its own block)") {
    val rows = Seq((1L, 1L, 1L), (2L, 2L, 1L), (3L, 5L, 1L))
    assert(fitMap(rows, 2) ===
      Map(1L -> (1L, 1L), 2L -> (2L, 1L), 3L -> (5L, 1L)))
  }

  test("a single violation pools to the weighted mean of the pair") {
    // x=1 → y 4, x=2 → y 0 with weight 3: pooled mean = 4/4 = 1
    val rows = Seq((1L, 4L, 1L), (2L, 0L, 3L))
    assert(fitMap(rows, 1) === Map(1L -> (1L, 1L), 2L -> (1L, 1L)))
  }

  test("pooling cascades left through earlier blocks") {
    // decreasing ys force one big pool: mean = (9+6+3)/3 = 6
    val rows = Seq((1L, 9L, 1L), (2L, 6L, 1L), (3L, 3L, 1L))
    assert(fitMap(rows, 3) === Map(1L -> (6L, 1L), 2L -> (6L, 1L), 3L -> (6L, 1L)))
  }

  test("matches the reference PAV on 300 random weighted inputs and is monotone") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300)(
      (rnd.nextInt(40).toLong, rnd.nextInt(1000).toLong - 200L,
        rnd.nextInt(9).toLong + 1L))
    val got = fitMap(rows, 4)
    assert(got === referencePav(rows))
    val sorted = got.toSeq.sortBy(_._1).map(_._2)
    sorted.sliding(2).foreach {
      case Seq((n1, d1), (n2, d2)) =>
        assert(BigInt(n1) * d2 <= BigInt(n2) * d1, "fit must be non-decreasing")
      case _ =>
    }
  }

  test("fit is identical under 1/4/32-partition input layouts") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(500)(
      (rnd.nextInt(25).toLong, rnd.nextInt(2).toLong, rnd.nextInt(5).toLong + 1L))
    val base = fitMap(rows, 1)
    assert(fitMap(rows, 4) === base)
    assert(fitMap(rows, 32) === base)
  }

  test("calibrate attaches the step function to every input row " +
    "(0/1 labels: fitted value is an exact probability)") {
    val rnd = new scala.util.Random(99)
    val rows = Seq.fill(400)(
      (rnd.nextInt(20).toLong, if (rnd.nextInt(100) < rnd.nextInt(20) * 5) 1L else 0L, 1L))
    val df = rows.toDF("x", "y", "w")
    val cal = Isotonic.calibrate(df, "x", "y", "w")
    assert(cal.count() === 400L)
    // mass conservation: Σ w·fit == Σ w·y exactly over the whole input
    // (blockwise the fitted mean preserves the block's weighted sum)
    val lhs = cal.select(sum(col("w") * col("fit_num") / col("fit_den")))
      .as[Double].head()
    val rhs = cal.select(sum(col("w") * col("y"))).as[Double].head()
    assert(math.abs(lhs - rhs) < 1e-6)
  }

  test("fitted fractions are gcd-reduced with positive denominators") {
    val rows = Seq((1L, 2L, 2L), (2L, 1L, 2L)) // pooled: (4+2)/4 = 3/2
    assert(fitMap(rows, 2) === Map(1L -> (3L, 2L), 2L -> (3L, 2L)))
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoSpec extends SparkSpec {
  import spark.implicits._

  // Honolulu and Hilo — the reference's home portal was data.hawaii.gov
  private val honolulu = (21.3069, -157.8583)
  private val hilo = (19.7074, -155.0885)

  private def locs = Seq(
    ("honolulu", honolulu._1, honolulu._2),
    ("hilo", hilo._1, hilo._2)).toDF("name", "lat", "lon")
    .withColumn("loc", Geo.location(col("lat"), col("lon")))

  test("haversine distance Honolulu→Hilo ≈ 340 km, symmetric, 0 on self") {
    val d = locs.filter($"name" === "honolulu").crossJoin(
        locs.filter($"name" === "hilo").select($"loc".as("loc2")))
      .select(Geo.distanceInMeters($"loc", $"loc2").as("d"),
        Geo.distanceInMeters($"loc2", $"loc").as("d2"),
        Geo.distanceInMeters($"loc", $"loc").as("self"))
      .head
    assert(math.abs(d.getDouble(0) - 340000) < 15000, d.getDouble(0))
    assert(d.getDouble(0) == d.getDouble(1))
    assert(d.getDouble(2) == 0.0)
  }

  test("within_box selects Honolulu but not Hilo for an Oahu box") {
    val hits = locs.filter(Geo.withinBox($"loc", 21.8, -158.4, 21.2, -157.5))
      .select("name").as[String].collect().toSeq
    assert(hits == Seq("honolulu"))
  }

  test("within_box wraps at the antimeridian when nwLon > seLon") {
    import spark.implicits._
    val pts = Seq(("fiji_east", -17.7, 178.0), ("fiji_west", -17.7, -179.5),
      ("hawaii", 21.3, -157.86), ("samoa", -13.8, -171.75))
      .toDF("name", "lat", "lon")
      .select($"name", Geo.location($"lat", $"lon").as("loc"))
    // 10°-wide box across the date line: lon ∈ [175, -175] wrapped —
    // catches both Fiji points, excludes Samoa at -171.75
    val hits = pts.filter(Geo.withinBox($"loc", 0.0, 175.0, -30.0, -175.0))
      .select("name").as[String].collect().toSet
    assert(hits == Set("fiji_east", "fiji_west"))
    // the non-wrapped orientation still behaves
    val normal = pts.filter(Geo.withinBox($"loc", 25.0, -160.0, 15.0, -155.0))
      .select("name").as[String].collect().toSet
    assert(normal == Set("hawaii"))
    // the SQL surface wraps identically (constant-folded If branch)
    graft.plans.GraftExtensions.register(spark)
    val sqlWrap = pts.filter(
        expr("within_box(loc.lat, loc.lon, 0.0, 175.0, -30.0, -175.0)"))
      .select("name").as[String].collect().toSet
    assert(sqlWrap == hits)
  }

  test("SQL surface via GraftExtensions: geo functions callable from $where strings") {
    graft.plans.GraftExtensions.register(spark)
    // SQL tree must equal the Column-API tree bit-for-bit
    val viaSql = locs.selectExpr("name",
      "distance_in_meters(lat, lon, 21.3069, -157.8583) AS dm",
      "within_circle(lat, lon, 21.3069, -157.8583, 400000) AS wc",
      "within_box(lat, lon, 21.8, -158.4, 21.2, -157.5) AS wb")
    val viaCols = locs.select(col("name"),
      Geo.distanceInMeters(col("loc"),
        Geo.location(lit(21.3069), lit(-157.8583))).as("dm"),
      Geo.withinCircle(col("loc"), 21.3069, -157.8583, 400000).as("wc"),
      Geo.withinBox(col("loc"), 21.8, -158.4, 21.2, -157.5).as("wb"))
    assert(viaSql.collect().toSet == viaCols.collect().toSet)
    // and it flows through the SoQL client's $where strings
    val filtered = locs.filter(
      expr("within_circle(lat, lon, 21.3069, -157.8583, 50000)"))
      .select("name").as[String].collect().toSeq
    assert(filtered == Seq("honolulu"))
  }

  test("within_circle radius gates correctly") {
    val near = locs.filter(
      Geo.withinCircle($"loc", honolulu._1, honolulu._2, 50000))
      .select("name").as[String].collect().toSeq
    assert(near == Seq("honolulu"))
    val wide = locs.filter(
      Geo.withinCircle($"loc", honolulu._1, honolulu._2, 400000))
    assert(wide.count() == 2)
  }

  test("cell neighborhood covers every pair within the radius (no false negatives)") {
    // deterministic pseudo-random points in a 1-degree box; every pair
    // within 10 km must share a (cellId, neighborCells) bucket when
    // cellDeg = 0.1 (>= 10 km at these latitudes)
    val pts = (1 to 400).map { i =>
      (i.toLong, 20.0 + (i * 37 % 100) / 100.0, -157.0 + (i * 73 % 100) / 100.0)
    }.toDF("id", "lat", "lon").withColumn("loc", Geo.location(col("lat"), col("lon")))
    val naive = pts.as("a").join(pts.as("b"),
        col("a.id") < col("b.id") &&
          Geo.distanceInMeters(col("a.loc"), col("b.loc")) <= 10000.0)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    val a = pts.select(col("id").as("id_a"), col("loc").as("loc_a"),
      Geo.cellId(col("loc"), 0.1).as("cell"))
    val b = pts.select(col("id").as("id_b"), col("loc").as("loc_b"),
      explode(Geo.neighborCells(col("loc"), 0.1)).as("cell"))
    val celled = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b") &&
        Geo.distanceInMeters(col("loc_a"), col("loc_b")) <= 10000.0)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
    assert(celled.toSet == naive)
    assert(celled.length == celled.toSet.size, "pair matched in >1 bucket")
  }

  test("a pair straddling the antimeridian still meets in a bucket") {
    val pts = Seq((1L, 0.0, 179.99), (2L, 0.0, -179.99), (3L, 0.0, 180.0))
      .toDF("id", "lat", "lon")
      .withColumn("loc", Geo.location(col("lat"), col("lon")))
    val a = pts.select(col("id").as("id_a"), col("loc").as("loc_a"),
      Geo.cellId(col("loc"), 0.1).as("cell"))
    val b = pts.select(col("id").as("id_b"), col("loc").as("loc_b"),
      explode(Geo.neighborCells(col("loc"), 0.1)).as("cell"))
    val pairs = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b") &&
        Geo.distanceInMeters(col("loc_a"), col("loc_b")) <= 10000.0)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    // ~2.2 km apart across lon=180; and +180.0 folds onto the -180 cell
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), pairs.toString)
    intercept[IllegalArgumentException] {
      Geo.cellId(col("loc"), 0.07) // does not tile 360 evenly
    }
  }

  test("ringFor covers the radius; defaults reproduce the 3x3 ring") {
    // the fixture radii at the default grid stay ring 1 (the original
    // 3x3 plan, bit-for-bit)
    assert(Geo.ringFor(10000.0, 0.1) == 1)
    assert(Geo.ringFor(8000.0, 0.1) == 1)
    // finer grids widen the ring: ceil(radius / (cellDeg * 110574 m))
    assert(Geo.ringFor(10000.0, 0.05) == 2)
    assert(Geo.ringFor(10000.0, 0.025) == 4)
    assert(Geo.ringFor(8000.0, 0.025) == 3)
    // never below 1, even when the cell dwarfs the radius
    assert(Geo.ringFor(100.0, 1.0) == 1)
  }

  test("ringFor widens with the latitude bound (lon degrees shrink as " +
    "cos(lat)); near-pole bounds are rejected") {
    // at the equator the 3-arg form matches the equatorial-band form
    assert(Geo.ringFor(10000.0, 0.025, 0.0) == Geo.ringFor(10000.0, 0.025))
    // the fixture bound (|lat| <= 4.95 deg) changes nothing: cos(4.95) is
    // still above 110574/111320
    assert(Geo.ringFor(10000.0, 0.025, 4.95) == 4)
    assert(Geo.ringFor(10000.0, 0.1, 4.95) == 1)
    // the advisor's case: 10 km at 0.025 deg and 40N needs ring 5 —
    // the equator-sized ring 4 spans only 4*0.025*111320*cos(40) ~ 8.5 km
    // east-west and silently drops true pairs
    assert(Geo.ringFor(10000.0, 0.025, 40.0) == 5)
    assert(Geo.ringFor(10000.0, 0.025, 40.0) > Geo.ringFor(10000.0, 0.025))
    // within ~1 deg of a pole the cosine bound collapses: loud, not wrong
    intercept[IllegalArgumentException] {
      Geo.ringFor(10000.0, 0.025, 89.5)
    }
  }

  test("mid-latitude fine grid with the lat-aware ring misses no pair " +
    "(40N, cellDeg 0.025 — the advisor scenario)") {
    val pts = (1 to 300).map { i =>
      (i.toLong, 40.0 + (i * 37 % 100) / 100.0, -74.0 + (i * 73 % 100) / 100.0)
    }.toDF("id", "lat", "lon")
      .withColumn("loc", Geo.location(col("lat"), col("lon")))
    val naive = pts.as("a").join(pts.as("b"),
        col("a.id") < col("b.id") &&
          Geo.distanceInMeters(col("a.loc"), col("b.loc")) <= 10000.0)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    val ring = Geo.ringFor(10000.0, 0.025, 41.0)
    val a = pts.select(col("id").as("id_a"), col("loc").as("loc_a"),
      Geo.cellId(col("loc"), 0.025).as("cell"))
    val b = pts.select(col("id").as("id_b"), col("loc").as("loc_b"),
      explode(Geo.neighborCells(col("loc"), 0.025, ring)).as("cell"))
    val celled = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b") &&
        Geo.distanceInMeters(col("loc_a"), col("loc_b")) <= 10000.0)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
    assert(celled.toSet == naive)
    assert(celled.length == celled.toSet.size, "pair matched in >1 bucket")
  }

  test("a finer grid with the covering ring misses no pair (ring 2)") {
    // same property as the 3x3 test, on a grid HALF the radius: cellDeg
    // 0.05 < 10 km, so ring 1 would miss pairs — ringFor's ring 2 must
    // cover, each pair in exactly one bucket
    val pts = (1 to 400).map { i =>
      (i.toLong, 20.0 + (i * 37 % 100) / 100.0, -157.0 + (i * 73 % 100) / 100.0)
    }.toDF("id", "lat", "lon").withColumn("loc", Geo.location(col("lat"), col("lon")))
    val naive = pts.as("a").join(pts.as("b"),
        col("a.id") < col("b.id") &&
          Geo.distanceInMeters(col("a.loc"), col("b.loc")) <= 10000.0)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    val ring = Geo.ringFor(10000.0, 0.05)
    val a = pts.select(col("id").as("id_a"), col("loc").as("loc_a"),
      Geo.cellId(col("loc"), 0.05).as("cell"))
    val b = pts.select(col("id").as("id_b"), col("loc").as("loc_b"),
      explode(Geo.neighborCells(col("loc"), 0.05, ring)).as("cell"))
    val celled = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b") &&
        Geo.distanceInMeters(col("loc_a"), col("loc_b")) <= 10000.0)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
    assert(celled.toSet == naive)
    assert(celled.length == celled.toSet.size, "pair matched in >1 bucket")
  }

  test("a ring wrapping the whole longitude circle is rejected") {
    val e = intercept[IllegalArgumentException] {
      // cellDeg 90 -> 4 lon cells; ring 2 spans 5 > 4 -> ids collide
      Geo.neighborCells(col("loc"), 90.0, 2)
    }
    assert(e.getMessage.contains("longitude ring"))
    intercept[IllegalArgumentException] {
      Geo.neighborCells(col("loc"), 0.1, 0)
    }
  }

  test("the 9 neighbor cell ids are distinct and include the own cell") {
    val one = Seq((21.3069, -157.8583)).toDF("lat", "lon")
      .withColumn("loc", Geo.location(col("lat"), col("lon")))
      .select(Geo.cellId(col("loc"), 0.1).as("own"),
        Geo.neighborCells(col("loc"), 0.1).as("nbrs"))
      .head()
    val own = one.getLong(0)
    val nbrs = one.getAs[scala.collection.Seq[Long]]("nbrs")
    assert(nbrs.size == 9 && nbrs.distinct.size == 9)
    assert(nbrs.contains(own))
  }
}

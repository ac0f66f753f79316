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

  test("within_circle radius gates correctly") {
    val near = locs.filter(
      Geo.withinCircle($"loc", honolulu._1, honolulu._2, 50000))
      .select("name").as[String].collect().toSeq
    assert(near == Seq("honolulu"))
    val wide = locs.filter(
      Geo.withinCircle($"loc", honolulu._1, honolulu._2, 400000))
    assert(wide.count() == 2)
  }
}

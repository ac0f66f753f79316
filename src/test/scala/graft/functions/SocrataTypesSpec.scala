package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SocrataTypesSpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    (1L, 21.3069, -157.8583,
      """{"address":"1 Main St","city":"Honolulu","state":"HI","zip":"96813"}""",
      "https://data.hawaii.gov/resource/abc1-def2", "Hawaii open data"),
    (2L, 21.4389, -158.0001, null.asInstanceOf[String],
      "http://example.org/path?x=1", null.asInstanceOf[String]),
    (3L, 20.7984, -156.3319, "not json at all", "ftp://host/file", ""))
    .toDF("id", "lat", "lon", "ha", "u", "d")

  test("full location struct carries lat/lon + human_address and parses it") {
    val df = rows.select(col("id"),
      SocrataTypes.location(col("lat"), col("lon"), col("ha")).as("loc"))
    assert(df.schema("loc").dataType.simpleString ==
      "struct<lat:double,lon:double,human_address:string>")
    val parsed = df.select(col("id"),
      SocrataTypes.humanAddress(col("loc")).as("addr"))
    val byId = parsed.collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    assert(byId(1L).getAs[String]("city") == "Honolulu")
    assert(byId(1L).getAs[String]("zip") == "96813")
    assert(byId(2L) == null)            // no address on the wire
    // malformed JSON → PERMISSIVE all-null struct, never an error
    assert(byId(3L) != null && (0 until 4).forall(byId(3L).isNullAt))
  }

  test("Geo functions work unchanged on the 3-field location shape") {
    val df = rows.select(col("id"),
      SocrataTypes.location(col("lat"), col("lon"), col("ha")).as("loc"))
    val honolulu = Geo.location(lit(21.3069), lit(-157.8583))
    val d = df.select(col("id"),
      Geo.distanceInMeters(col("loc"), honolulu).as("m"),
      Geo.withinCircle(col("loc"), 21.3069, -157.8583, 30000.0).as("near"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2)))
      .toMap
    assert(d(1L)._1 < 1.0 && d(1L)._2)            // same point
    assert(d(2L)._1 > 10000 && d(2L)._1 < 30000 && d(2L)._2)
    assert(d(3L)._1 > 100000 && !d(3L)._2)        // Maui, outside circle
  }

  test("fixed_timestamp parses offset-carrying ISO instants to one UTC " +
    "timeline (round-trip incl. a non-UTC offset)") {
    val df = Seq(
      (1L, "2014-10-13T00:00:00.000Z"),       // UTC with millis
      (2L, "2014-10-13T09:00:00+09:00"),      // same instant, Tokyo offset
      (3L, "2014-10-12T14:00:00.000000-10:00"), // same instant, Honolulu µs
      (4L, "2014-10-13T0000Z"),               // malformed → null, no crash
      (5L, null.asInstanceOf[String]))
      .toDF("id", "raw")
    val got = SocrataTypes.withFixedTimestamps(df, "raw")
    assert(got.schema("raw").dataType.typeName == "timestamp")
    val byId = got.collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    // 1, 2, 3 are the SAME instant expressed in three zones
    assert(byId(1L).isDefined && byId(1L) == byId(2L) && byId(2L) == byId(3L))
    assert(byId(1L).get.toInstant.toString == "2014-10-13T00:00:00Z")
    assert(byId(4L).isEmpty && byId(5L).isEmpty)
    // compact ±hhmm offset form also lands on the same instant
    val compact = Seq("2014-10-13T09:00:00+0900").toDF("raw")
      .select(SocrataTypes.fixedTimestamp(col("raw")).as("ts"))
      .head.getTimestamp(0)
    assert(compact.toInstant.toString == "2014-10-13T00:00:00Z")
  }

  test("url type struct + host extraction") {
    val df = rows.select(col("id"),
      SocrataTypes.url(col("u"), col("d")).as("link"))
    assert(df.schema("link").dataType.simpleString ==
      "struct<url:string,description:string>")
    val hosts = df.select(col("id"), SocrataTypes.urlHost(col("link")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hosts(1L) == "data.hawaii.gov")
    assert(hosts(2L) == "example.org")
    assert(hosts(3L) == "host")
  }
}

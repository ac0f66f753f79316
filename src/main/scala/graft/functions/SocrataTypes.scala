package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The remaining Socrata column-type mappings from SURVEY §1.2 beyond what
  * the fixtures exercise (SURVEY fixtures carry no address or url data —
  * these are capability mappings with unit-tier coverage):
  *
  *  - `location`: the full published SODA shape is (latitude, longitude,
  *    human_address) where human_address is a JSON STRING like
  *    `{"address":"1 Main St","city":"Honolulu","state":"HI","zip":"96813"}`
  *    — not a nested struct on the wire. Mapped to
  *    `struct<lat:double, lon:double, human_address:string>`; the JSON
  *    stays a string at rest (cheap, schema-drift-proof) and is parsed on
  *    demand with [[humanAddress]] (codegen'd `from_json`).
  *  - `url`: `{url, description}` → `struct<url:string, description:string>`.
  *
  * [[Geo]]'s `distance_in_meters` / `within_box` / `within_circle` read
  * only the `lat`/`lon` fields, so they work on both the 2-field fixture
  * locations and the full 3-field shape unchanged.
  */
object SocrataTypes {

  /** published SODA human_address keys (all strings on the wire) */
  val humanAddressSchema: StructType = StructType(Seq(
    StructField("address", StringType), StructField("city", StringType),
    StructField("state", StringType), StructField("zip", StringType)))

  /** full Socrata `location`: lat/lon + raw human_address JSON string */
  def location(lat: Column, lon: Column, humanAddress: Column): Column =
    struct(lat.cast("double").as("lat"), lon.cast("double").as("lon"),
      humanAddress.cast("string").as("human_address"))

  /** parse a location's human_address JSON into its typed struct
    * (null-safe: a null wire value yields a null struct; malformed JSON
    * yields an all-null struct — `from_json` PERMISSIVE mode — so rows
    * that carry coordinates without a usable address never error)
    */
  def humanAddress(loc: Column): Column =
    from_json(loc.getField("human_address"), humanAddressSchema)

  /** Socrata `url` type: {url, description} */
  def url(url: Column, description: Column): Column =
    struct(url.cast("string").as("url"),
      description.cast("string").as("description"))

  /** the url's registrable host, for per-domain pipeline stats (a SODA
    * `url` column feeding the training-data provenance ledger)
    */
  def urlHost(u: Column): Column =
    parse_url(u.getField("url"), lit("HOST"))

  /** Socrata `fixed_timestamp` (round 8): an ISO-8601 instant WITH a zone
    * offset on the wire — `2014-10-13T00:00:00.000Z`,
    * `2014-10-13T09:00:00+09:00` — unlike `floating_timestamp`, which is
    * zoneless. Mapped to `TimestampType` (an instant: micros from the
    * epoch), so parsing normalizes to UTC by construction — `+09:00` at
    * 09:00 and `Z` at 00:00 are the SAME value. Accepts 0/3/6 fractional
    * digits and `Z`/`±hh:mm`/`±hhmm` offsets; anything unparseable maps to
    * null (`try_to_timestamp`) rather than failing the fetch — malformed
    * portal rows are a data-quality fact, not an ingest crash.
    */
  def fixedTimestamp(ts: Column): Column = {
    val s = ts.cast("string")
    coalesce(
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSS]XXX")),
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSS]XX")),
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSS]X")))
  }

  /** Coerce fetched JSON string columns to typed UTC timestamps — the
    * post-fetch hop for `fixed_timestamp` columns coming off
    * [[graft.sources.SodaHttp.readResource]] (Spark's JSON inference
    * leaves offset-carrying ISO strings as strings).
    */
  def withFixedTimestamps(df: org.apache.spark.sql.DataFrame,
                          cols: String*): org.apache.spark.sql.DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, fixedTimestamp(col(c))))
}

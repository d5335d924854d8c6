package graft.sinks

import graft.SparkSpec
import graft.functions.{GeoFunctions, HstoreCompat}
import org.apache.spark.sql.functions._

/** Pins the EXACT COPY text a live PostGIS load would receive, against
  * golden strings derived from the reference's schema and wire format
  * (schema.sql:95-103 nodes, :188-195 ways; filter.py:139-152 row
  * framing) — so a real-Postgres run later is a connection string
  * away, not a code change:
  *
  *   - geometry columns are `geometry(…,4326)` (schema.sql:102,194),
  *     which in COPY text take hex EWKB WITH the embedded SRID (what
  *     pyosmium's WKBFactory ships); the point golden below is the
  *     canonical PostGIS `SRID=4326;POINT(0.5 0.25)` encoding
  *     (`0101000020e6100000…` — independently checkable against
  *     `SELECT ST_GeomFromEWKT('SRID=4326;POINT(0.5 0.25)')::text`),
  *   - `tags` is hstore text (`"k"=>"v",…`) with the reference's
  *     `_sanitize` escaping (filter.py:92-100),
  *   - the 7 fields ride tab-separated in the reference's column
  *     order (filter.py:47-57).
  */
class PostgisCopyGoldenSpec extends SparkSpec {
  import spark.implicits._

  // IEEE-754 LE hex for the fixture coordinates: 0.5 = 0x3FE0...,
  // 0.25 = 0x3FD0..., 1.0 = 0x3FF0..., 2.0 = 0x4000... — byte-reversed
  private val hex05 = "000000000000e03f"
  private val hex025 = "000000000000d03f"
  private val hex1 = "000000000000f03f"
  private val hex2 = "0000000000000040"

  test("EWKB point: canonical SRID=4326 PostGIS encoding") {
    val got = GeoFunctions.ewkbWithSridBytes(
      GeoFunctions.wkbPointBytes(0.5, 0.25), 4326)
    assert(got.map("%02x".format(_)).mkString ==
      s"0101000020e6100000$hex05$hex025")
    // the well-known docs example: SRID=4326;POINT(1 2)
    val p12 = GeoFunctions.ewkbWithSridBytes(
      GeoFunctions.wkbPointBytes(1.0, 2.0), 4326)
    assert(p12.map("%02x".format(_)).mkString ==
      s"0101000020e6100000$hex1$hex2")
  }

  test("EWKB linestring and multipolygon: SRID flag + untouched payload") {
    val ls = GeoFunctions.ewkbWithSridBytes(
      GeoFunctions.wkbLineStringBytes(Seq((0.5, 0.25), (1.0, 2.0))), 4326)
    assert(ls.map("%02x".format(_)).mkString ==
      s"0102000020e610000002000000$hex05$hex025$hex1$hex2")
    val ring = Seq((0.0, 0.0), (1.0, 0.0), (1.0, 2.0), (0.0, 0.0))
    val mp = GeoFunctions.ewkbWithSridBytes(
      GeoFunctions.wkbMultiPolygonBytes(Seq(ring)), 4326)
    val plain = GeoFunctions.wkbMultiPolygonBytes(Seq(ring))
    // header: 01 + (6 | 0x20000000) LE + srid LE, then the plain body
    assert(mp.map("%02x".format(_)).mkString.startsWith(
      "0106000020e6100000"))
    assert(mp.drop(9).sameElements(plain.drop(5)))
    assert(GeoFunctions.ewkbWithSridBytes(null, 4326) == null)
  }

  test("full COPY node row: golden bytes for hstore + EWKB-hex geometry") {
    val df = Seq((123L, 2, 7, java.sql.Timestamp.valueOf("2020-01-02 03:04:05"),
        99L, Map("name" -> "Joe's \"Bar\"", "amenity" -> "pub"), 0.5, 0.25))
      .toDF("id", "version", "user_id", "tstamp", "changeset_id", "tags",
        "lon", "lat")
    val row = df.select(HstoreCompat.tsvRow(
        col("id"), col("version"), col("user_id"), col("tstamp"),
        col("changeset_id"), col("tags"),
        GeoFunctions.ewkb(GeoFunctions.wkb_point(col("lon"), col("lat"))))
      .as("r")).as[String].head()
    // reference escaping: '"' -> two backslashes + quote (filter.py:96)
    val bs2 = "\\\\"
    val golden = "123\t2\t7\t2020-01-02 03:04:05\t99\t" +
      "\"amenity\"=>\"pub\",\"name\"=>\"Joe's " + bs2 + "\"Bar" + bs2 + "\"\"\t" +
      s"0101000020e6100000$hex05$hex025"
    assert(row == golden)
    // and it targets the reference's exact column list (filter.py:47-57)
    assert(PoiSink.copySql("nodes", "geom") ==
      "COPY nodes (id, version, user_id, tstamp, changeset_id, tags, geom) FROM STDIN")
  }

  test("full COPY way row: linestring column, EWKB hex") {
    val df = Seq((900L, 1, 3, java.sql.Timestamp.valueOf("2021-06-07 08:09:10"),
        42L, Map("highway" -> "residential"),
        Seq((0.5, 0.25), (1.0, 2.0))))
      .toDF("id", "version", "user_id", "tstamp", "changeset_id", "tags", "path")
    val row = df.select(HstoreCompat.tsvRow(
        col("id"), col("version"), col("user_id"), col("tstamp"),
        col("changeset_id"), col("tags"),
        GeoFunctions.ewkb(GeoFunctions.wkb_linestring(
          expr("transform(path, p -> struct(p._1 as lon, p._2 as lat))"))))
      .as("r")).as[String].head()
    val golden = "900\t1\t3\t2021-06-07 08:09:10\t42\t" +
      "\"highway\"=>\"residential\"\t" +
      s"0102000020e610000002000000$hex05$hex025$hex1$hex2"
    assert(row == golden)
    assert(PoiSink.copySql("ways", "linestring") ==
      "COPY ways (id, version, user_id, tstamp, changeset_id, tags, linestring) FROM STDIN")
  }
}

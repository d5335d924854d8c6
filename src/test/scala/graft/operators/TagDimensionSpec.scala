package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** S2/S3/K4/C11 — the tags.json memo format round-trip
  * (reference filter.py:282-299).
  */
class TagDimensionSpec extends SparkSpec {
  import spark.implicits._

  private val sampleJson =
    """{"retrieval_date": "2024-01-02T03:04", "data": {"amenity": {"cafe": 150000, "bar": 90000}, "shop": {"bakery": 120000}}}"""

  test("loadJson parses the reference memo shape into (key, value, count)") {
    val dir = Files.createTempDirectory("tags").toString
    Files.writeString(java.nio.file.Paths.get(dir, "tags.json"), sampleJson)
    val dim = TagDimension.loadJson(spark, dir + "/tags.json")
    val got = dim.select("key", "value", "count")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("amenity", "cafe", 150000L), ("amenity", "bar", 90000L),
      ("shop", "bakery", 120000L)))
  }

  test("saveJson/loadJson round-trips") {
    val dim = Seq(("amenity", "cafe", 150000L, true), ("shop", "bakery", 120000L, true))
      .toDF("key", "value", "count", "in_wiki")
    val out = Files.createTempDirectory("tags-out").toString + "/memo"
    TagDimension.saveJson(dim, out, "2024-01-02T03:04")
    val back = TagDimension.loadJson(spark, out)
    assert(back.select("key", "value", "count").as[(String, String, Long)]
      .collect().toSet ==
      Set(("amenity", "cafe", 150000L), ("shop", "bakery", 120000L)))
  }

  test("fetchApi: REAL HTTP round-trip against an in-JVM TagInfo-shaped server (S2-live)") {
    // the zero-egress container can't reach taginfo.openstreetmap.org;
    // a JDK com.sun.net.httpserver serving the checked-in fixture
    // drives the full network code path (socket, status, query string)
    val fixtureBytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/taginfo_amenity.json").getPath))
    val requests = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/4/key/values",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        requests.add(ex.getRequestURI.toString)
        ex.sendResponseHeaders(200, fixtureBytes.length)
        ex.getResponseBody.write(fixtureBytes)
        ex.close()
      })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val live = TagDimension.fetchApi(spark, base, Seq("amenity"))
        .as[(String, String, Long, Boolean)].collect().toSet
      // the HTTP path and the fixture-file path must parse identically
      val file = TagDimension.loadApiEnvelope(spark,
          getClass.getResource("/taginfo_amenity.json").getPath, "amenity")
        .as[(String, String, Long, Boolean)].collect().toSet
      assert(live == file && live.nonEmpty)
      // the request is the reference's exact shape (filter.py:235-239)
      val uri = requests.poll()
      assert(uri.contains("key=amenity") && uri.contains("rp=100") &&
        uri.contains("sortname=count_ways") && uri.contains("sortorder=desc"),
        uri)
      // a non-200 must abort loudly, never yield an empty dimension
      server.createContext("/broken/api/4/key/values",
        (ex: com.sun.net.httpserver.HttpExchange) => {
          ex.sendResponseHeaders(503, -1); ex.close()
        })
      intercept[IllegalArgumentException] {
        TagDimension.fetchApi(spark, s"$base/broken", Seq("amenity")).collect()
      }
    } finally server.stop(0)
  }

  test("loadApiEnvelope parses the raw API envelope with retrieval-time filters (C11)") {
    import graft.model.PoiSettings
    val fixture = getClass.getResource("/taginfo_amenity.json").getPath
    val dim = TagDimension.loadApiEnvelope(spark, fixture, "amenity")
    // the ';' multi-value and the in_wiki=false row are dropped at parse
    // time, like retrieve_taginfo (filter.py:241-247); paging/fraction/
    // description fields are ignored
    assert(dim.select("key", "value", "count").as[(String, String, Long)]
      .collect().toSet == Set(
        ("amenity", "parking", 6120000L),
        ("amenity", "restaurant", 1520000L),
        ("amenity", "bench", 2490000L)))

    // same dim as the memo path: a tags.json carrying the envelope's
    // surviving entries prepares to identical rows
    val memo = """{"retrieval_date": "2024-05-01", "data": {"amenity": {"parking": 6120000, "restaurant": 1520000, "bench": 2490000}}}"""
    val dir = Files.createTempDirectory("tags-env").toString
    Files.writeString(java.nio.file.Paths.get(dir, "tags.json"), memo)
    val settings = PoiSettings(keys = Seq("amenity"))
    val viaEnvelope = TagDimension.prepare(dim, settings)
      .select("key", "value", "count").as[(String, String, Long)].collect().toSet
    val viaMemo = TagDimension.prepare(
        TagDimension.loadJson(spark, dir + "/tags.json"), settings)
      .select("key", "value", "count").as[(String, String, Long)].collect().toSet
    assert(viaEnvelope == viaMemo)
  }

  test("fromTaggedObjects rebuilds counts from tag maps") {
    val objs = Seq(
      (1L, Map("amenity" -> "cafe")),
      (2L, Map("amenity" -> "cafe", "shop" -> "bakery")),
      (3L, Map("amenity" -> "bar"))
    ).toDF("id", "tags")
    val got = TagDimension.fromTaggedObjects(objs)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("amenity", "cafe", 2L), ("amenity", "bar", 1L), ("shop", "bakery", 1L)))
  }
}

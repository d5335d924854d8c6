package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Http: envelope split (status / headers / binary-safe body),
  * redirect-graph resolution by pointer doubling, sitemap parse, and
  * the re-crawl schedule.
  */
class HttpSpec extends SparkSpec {
  import spark.implicits._

  private def resp(body: String,
      status: String = "200 OK",
      headers: Seq[String] = Seq("Content-Type: text/html; charset=UTF-8"),
      sep: String = "\r\n"): Array[Byte] =
    (s"HTTP/1.1 $status" +: headers).mkString("", sep, sep + sep)
      .getBytes("ISO-8859-1") ++ body.getBytes("UTF-8")

  test("envelope split: status, headers case-insensitive first-wins, media type, charset") {
    val df = Seq(Tuple1(resp("<html>x</html>",
        headers = Seq("content-TYPE: Text/HTML; charset=\"utf-8\"",
          "X-Dup: first", "X-Dup: second", "Location: http://t.ex/")))
      ).toDF("payload")
    val row = Http.responseParts(df)
      .select($"status", $"media_type", $"charset", $"location",
        decode($"body", "UTF-8").as("b"))
      .as[(Int, String, String, String, String)].head()
    assert(row === ((200, "text/html", "utf-8", "http://t.ex/",
      "<html>x</html>")))
    val dup = df.select(Http.header($"payload", "X-Dup").as("v"))
      .as[String].head()
    assert(dup === "first")
  }

  test("body slicing is binary-safe: every byte value round-trips") {
    val raw = Array.tabulate[Byte](256)(i => i.toByte)
      .filterNot(b => b == '\r'.toByte || b == '\n'.toByte)
    val payload = "HTTP/1.1 200 OK\r\nContent-Length: x\r\n\r\n"
      .getBytes("ISO-8859-1") ++ raw
    val out = Seq(Tuple1(payload)).toDF("payload")
      .select(Http.body($"payload").as("b")).as[Array[Byte]].head()
    assert(out.toSeq === raw.toSeq)
  }

  test("bare-LF framing tolerated; truncated head and non-HTTP payloads yield nulls") {
    val lf = Seq(Tuple1(resp("body!", sep = "\n"))).toDF("payload")
      .select(Http.statusCode($"payload").as("s"),
        decode(Http.body($"payload"), "UTF-8").as("b"))
      .as[(Option[Int], String)].head()
    assert(lf === ((Some(200), "body!")))
    val odd = Seq(
      Tuple1("HTTP/1.1 301 Moved\r\nLocation: /x".getBytes("ISO-8859-1")),
      Tuple1("not an http response at all".getBytes("UTF-8")))
      .toDF("payload")
      .select(Http.statusCode($"payload").as("s"),
        Http.body($"payload").as("b"),
        Http.header($"payload", "Location").as("l"))
      .as[(Option[Int], Option[Array[Byte]], Option[String])]
      .collect()
    assert(odd(0)._1 === Some(301) && odd(0)._2.isEmpty &&
      odd(0)._3 === Some("/x")) // headers parse even without a body
    assert(odd(1) === ((None, None, None)))
  }

  test("decodedBody: declared charset wins, meta charset sniffs when " +
      "undeclared, utf-8 otherwise") {
    // 0xE9 = é in ISO-8859-1 and invalid UTF-8 — the decode choice shows
    val latinBody = "<html><meta charset='ISO-8859-1'><p>café</p></html>"
      .getBytes("ISO-8859-1")
    val rows = Seq(
      // undeclared → meta sniff picks latin-1
      Tuple1("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        .getBytes("ISO-8859-1") ++ latinBody),
      // declared utf-8 beats a lying meta tag
      Tuple1("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        .getBytes("ISO-8859-1") ++
        "<meta charset='ISO-8859-1'><p>café utf8</p>".getBytes("UTF-8")),
      // neither speaks → utf-8 default
      Tuple1("HTTP/1.1 200 OK\r\n\r\n".getBytes("ISO-8859-1") ++
        "plain café".getBytes("UTF-8")))
      .toDF("payload")
      .select(Http.effectiveCharset($"payload").as("cs"),
        Http.decodedBody($"payload").as("t"))
      .as[(Option[String], String)].collect()
    assert(rows(0) === ((Some("iso-8859-1"),
      "<html><meta charset='ISO-8859-1'><p>café</p></html>")))
    assert(rows(1) === ((Some("utf-8"),
      "<meta charset='ISO-8859-1'><p>café utf8</p>")))
    assert(rows(2) === ((None, "plain café")))
  }

  test("redirectEdges: 3xx responses with Location only") {
    val recs = Seq(
      ("response", "http://a.ex/1", resp("", status = "301 Moved",
        headers = Seq("Location: http://a.ex/2"))),
      ("response", "http://a.ex/2", resp("ok")), // 200 — no edge
      ("response", "http://a.ex/3", resp("", status = "302 Found",
        headers = Seq("X-No-Location: true"))), // 3xx, no target
      ("request", "http://a.ex/4", resp("", status = "303 Other",
        headers = Seq("Location: http://x.ex/")))) // wrong record type
      .toDF("record_type", "target_uri", "payload")
    val edges = Http.redirectEdges(recs).as[(String, String)].collect()
    assert(edges.toSeq === Seq(("http://a.ex/1", "http://a.ex/2")))
  }

  test("resolveRedirects: chains, cycles, and the doubling cap") {
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "d"), // 3-hop chain, d terminal
      ("x", "y"), ("y", "x"), // 2-cycle
      ("solo", "end")) // 1-hop
      .toDF("url", "next")
    val out = Http.resolveRedirects(edges, maxDoublings = 4)
      .as[(String, String, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out.filter(_._4) === Seq(("a", "d", 3L, true),
      ("b", "d", 2L, true), ("c", "d", 1L, true), ("solo", "end", 1L, true)))
    assert(out.filterNot(_._4).map(_._1).sorted === Seq("x", "y"))
    // cap: one doubling follows at most 2 hops — a lands on c, which
    // still has an outgoing edge, so it reports unresolved
    val capped = Http.resolveRedirects(edges, maxDoublings = 1)
      .filter($"url" === "a").as[(String, String, Long, Boolean)].head()
    assert(capped === (("a", "c", 2L, false)))
  }

  test("redirectEdges: recrawl duplicates collapse; latest-fetch-wins " +
      "with a date column; resolveRedirects survives raw per-fetch edges") {
    // the same URL fetched 3 times (recrawl archive) — twice with the
    // old Location, once (latest) with a new one
    val recs = Seq(
      ("response", "http://r.ex/1", "2026-01-01T00:00:00Z",
        resp("", status = "301 Moved",
          headers = Seq("Location: http://r.ex/old"))),
      ("response", "http://r.ex/1", "2026-01-02T00:00:00Z",
        resp("", status = "301 Moved",
          headers = Seq("Location: http://r.ex/old"))),
      ("response", "http://r.ex/1", "2026-01-03T00:00:00Z",
        resp("", status = "301 Moved",
          headers = Seq("Location: http://r.ex/new"))))
      .toDF("record_type", "target_uri", "warc_date", "payload")
    // no date column: distinct edges — both historical targets, once each
    val bare = Http.redirectEdges(recs).as[(String, String)]
      .collect().sorted.toSeq
    assert(bare === Seq(("http://r.ex/1", "http://r.ex/new"),
      ("http://r.ex/1", "http://r.ex/old")))
    // latest-fetch-wins: the hop map is a function
    val latest = Http.redirectEdges(recs, dateCol = Some("warc_date"))
      .as[(String, String)].collect().toSeq
    assert(latest === Seq(("http://r.ex/1", "http://r.ex/new")))
    // raw per-fetch edges with N-fold multiplicity resolve to the SAME
    // rows as the distinct relation — no duplicate blowup
    val dup = Seq(("a", "b"), ("a", "b"), ("a", "b"),
      ("b", "c"), ("b", "c")).toDF("url", "next")
    val out = Http.resolveRedirects(dup, maxDoublings = 3)
      .as[(String, String, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out === Seq(("a", "c", 2L, true), ("b", "c", 1L, true)))
  }

  test("sitemapEntries: loc + optional lastmod, entity decode, caller columns kept") {
    val xml = """<?xml version="1.0"?><urlset>
      |<url><loc> http://s.ex/a?x=1&amp;y=2 </loc>
      |<lastmod>2026-03-01T00:00:00Z</lastmod></url>
      |<url><loc>http://s.ex/b</loc></url>
      |<url><priority>0.5</priority></url>
      |</urlset>""".stripMargin
    val out = CrawlPipeline.sitemapEntries(
        Seq(("h1", xml)).toDF("host", "xml"), "xml")
      .select($"host", $"url", date_format($"lastmod",
        "yyyy-MM-dd HH:mm:ss").as("lm"))
      .as[(String, String, Option[String])].collect().sortBy(_._2).toSeq
    assert(out === Seq(
      ("h1", "http://s.ex/a?x=1&y=2", Some("2026-03-01 00:00:00")),
      ("h1", "http://s.ex/b", None)))
  }

  test("sitemap INDEX files: zero page rows from sitemapEntries, child " +
      "sitemaps from sitemapIndexEntries; a urlset yields zero index rows") {
    val index = """<?xml version="1.0"?><sitemapindex>
      |<sitemap><loc>http://s.ex/sitemap1.xml</loc>
      |<lastmod>2026-03-01T00:00:00Z</lastmod></sitemap>
      |<sitemap><loc>http://s.ex/sitemap2.xml</loc></sitemap>
      |</sitemapindex>""".stripMargin
    val urlset = """<?xml version="1.0"?><urlset>
      |<url><loc>http://s.ex/page</loc></url></urlset>""".stripMargin
    val df = Seq(("h1", index), ("h2", urlset)).toDF("host", "xml")
    // an index file used to leak its first child-sitemap URL as a bogus
    // page entry (one </url>-less chunk); now it contributes nothing
    val pages = CrawlPipeline.sitemapEntries(df, "xml")
      .select($"host", $"url").as[(String, String)].collect().toSeq
    assert(pages === Seq(("h2", "http://s.ex/page")))
    val children = CrawlPipeline.sitemapIndexEntries(df, "xml")
      .select($"host", $"sitemap_url", date_format($"lastmod",
        "yyyy-MM-dd HH:mm:ss").as("lm"))
      .as[(String, String, Option[String])].collect().sortBy(_._2).toSeq
    assert(children === Seq(
      ("h1", "http://s.ex/sitemap1.xml", Some("2026-03-01 00:00:00")),
      ("h1", "http://s.ex/sitemap2.xml", None)))
  }

  test("recrawlSchedule: new / stale / fresh / unlisted hand-computed") {
    val sm = Seq(
      ("u/new", Some("2026-03-01 00:00:00")),
      ("u/stale", Some("2026-03-01 00:00:00")),
      ("u/fresh", Some("2026-01-01 00:00:00")),
      ("u/nolastmod", None))
      .toDF("url", "lm").withColumn("lastmod", to_timestamp($"lm"))
    val cr = Seq(
      ("u/stale", "2026-02-01 00:00:00"),
      ("u/fresh", "2026-02-01 00:00:00"),
      ("u/nolastmod", "2026-02-01 00:00:00"),
      ("u/unlisted", "2026-02-01 00:00:00"))
      .toDF("url", "ft").withColumn("fetch_ts", to_timestamp($"ft"))
    val out = CrawlPipeline.recrawlSchedule(sm, cr)
      .select($"url", $"verdict").as[(String, String)]
      .collect().sortBy(_._1).toSeq
    assert(out === Seq(("u/fresh", "fresh"), ("u/new", "new"),
      ("u/nolastmod", "fresh"), ("u/stale", "stale"),
      ("u/unlisted", "unlisted")))
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CrawlPipeline.fromWarc: the crawl's own robots records gate pages,
  * only HTML responses extract, boilerplate drops, ids mint
  * deterministically.
  */
class CrawlPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val content =
    "the quick brown fox and the lazy dog jumped over the fence again"

  private def page(n: Int): String =
    s"""<html><head><title>Page $n</title></head><body>
       |<div><a href="/">Home</a> <a href="/a">About</a></div>
       |<p>$content number $n</p></body></html>""".stripMargin

  private def crawlDir(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-crawlpipe-").toString
    Seq(
      ("<urn:c:r1>", "response", "http://h.ex/robots.txt",
        "2026-01-01T00:00:00Z", "text/plain",
        "User-agent: *\nDisallow: /private"),
      ("<urn:c:p1>", "response", "http://h.ex/public/1",
        "2026-01-01T00:01:00Z", "text/html; charset=utf-8", page(1)),
      ("<urn:c:p2>", "response", "http://h.ex/private/2",
        "2026-01-01T00:02:00Z", "text/html", page(2)),
      ("<urn:c:p3>", "response", "http://OTHER.ex/3",
        "2026-01-01T00:03:00Z", "text/html", page(3)),
      ("<urn:c:p4>", "response", "http://h.ex/img/4",
        "2026-01-01T00:04:00Z", "image/png", "notanimage"),
      ("<urn:c:i>", "warcinfo", null,
        "2026-01-01T00:00:00Z", "application/warc-fields", "software: graft")
    ).toDF("record_id", "record_type", "target_uri", "warc_date",
        "content_type", "body")
      .withColumn("payload", encode(col("body"), "UTF-8")).drop("body")
      .coalesce(1).write.format("warc").mode("append")
      .option("compression", "gzip").save(dir)
    dir
  }

  test("fromWarc: in-crawl robots gate, HTML-only, main content, stable ids") {
    val records = spark.read.format("warc").load(crawlDir())
    val docs = CrawlPipeline.fromWarc(records)
      .select($"url", $"source", $"title", $"text", $"doc_id")
      .as[(String, String, String, String, Long)].collect().sortBy(_._1)
    assert(docs.map(_._1).toSeq ==
      Seq("http://OTHER.ex/3", "http://h.ex/public/1"),
      docs.map(_._1).mkString(","))
    val byUrl = docs.map(d => d._1 -> d).toMap
    val p1 = byUrl("http://h.ex/public/1")
    assert(p1._2 == "h.ex" && p1._3 == "Page 1")
    assert(p1._4 == content + " number 1") // nav boilerplate dropped
    assert(byUrl("http://OTHER.ex/3")._2 == "other.ex") // host case-folded
    // deterministic mint: same crawl → same ids
    val again = CrawlPipeline.fromWarc(records)
      .select($"url", $"doc_id").as[(String, Long)].collect().toMap
    docs.foreach { d => assert(again(d._1) == d._5) }
  }

  test("fromWarcStream: streaming twin == batch chain (static rules), append-mode, no state") {
    val dir = crawlDir()
    val records = spark.read.format("warc").load(dir)
    // rules parsed BATCH-side from the same crawl (the refresh pattern)
    val rules = Robots.parseRules(
      records.filter($"target_uri".endsWith("/robots.txt"))
        .select(lower(regexp_extract($"target_uri",
          "(?i)^https?://([^/:]+)", 1)).as("host"),
          decode($"payload", "UTF-8").as("robots_text")),
      "host", "robots_text", "*")
    val q = CrawlPipeline.fromWarcStream(
        spark.readStream.format("warc").load(dir), rules)
      .writeStream.format("memory").queryName("crawl_stream_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("crawl_stream_out")
      .select($"doc_id", $"url", $"source", $"title", $"text")
      .as[(Long, String, String, String, String)].collect().sortBy(_._2)
    val want = CrawlPipeline.fromWarc(records)
      .select($"doc_id", $"url", $"source", $"title", $"text")
      .as[(Long, String, String, String, String)].collect().sortBy(_._2)
    assert(got.toSeq == want.toSeq && got.nonEmpty)
  }

  test("fromWarc httpEnvelope: status gate, parsed media type, charset decode, " +
      "enveloped robots") {
    def env(status: String, ct: String, body: Array[Byte],
        extra: String = ""): Array[Byte] =
      (s"HTTP/1.1 $status\r\nContent-Type: $ct\r\n$extra\r\n")
        .getBytes("ISO-8859-1") ++ body
    val html = (n: Int) => s"<html><head><title>E$n</title></head>" +
      s"<body><p>$content page $n</p></body></html>"
    val dir = java.nio.file.Files
      .createTempDirectory("graft-crawlenv-").toString
    Seq(
      ("<urn:e:r>", "response", "http://e.ex/robots.txt",
        env("200 OK", "text/plain",
          "User-agent: *\nDisallow: /private".getBytes("UTF-8"))),
      ("<urn:e:1>", "response", "http://e.ex/ok/1",
        env("200 OK", "text/html; charset=utf-8",
          html(1).getBytes("UTF-8"))),
      // latin-1 page: 0xE9 is é in ISO-8859-1 and INVALID UTF-8 —
      // only the declared-charset decode reads it
      ("<urn:e:2>", "response", "http://e.ex/latin/2",
        env("200 OK", "text/html; charset=ISO-8859-1",
          ("<html><head><title>café</title></head><body><p>" +
            content + " café</p></body></html>")
            .getBytes("ISO-8859-1"))),
      ("<urn:e:3>", "response", "http://e.ex/gone/3",
        env("404 Not Found", "text/html", html(3).getBytes("UTF-8"))),
      ("<urn:e:4>", "response", "http://e.ex/moved/4",
        env("301 Moved Permanently", "text/html",
          html(4).getBytes("UTF-8"), extra = "Location: /ok/1\r\n")),
      ("<urn:e:5>", "response", "http://e.ex/private/5",
        env("200 OK", "text/html", html(5).getBytes("UTF-8"))),
      ("<urn:e:6>", "response", "http://e.ex/img/6",
        env("200 OK", "image/png", Array[Byte](1, 2, 3))),
      // RFC 9309 §2.3.1.4: robots.txt answering 5xx => assume complete
      // disallow — f.ex's page must DROP despite its own 200
      ("<urn:e:fr>", "response", "http://f.ex/robots.txt",
        env("503 Service Unavailable", "text/plain",
          Array.emptyByteArray)),
      ("<urn:e:f1>", "response", "http://f.ex/ok/1",
        env("200 OK", "text/html", html(7).getBytes("UTF-8"))),
      // §2.3.1.3: robots.txt answering 4xx => unrestricted — g.ex's
      // page passes
      ("<urn:e:gr>", "response", "http://g.ex/robots.txt",
        env("404 Not Found", "text/plain", Array.emptyByteArray)),
      ("<urn:e:g1>", "response", "http://g.ex/ok/1",
        env("200 OK", "text/html", html(8).getBytes("UTF-8"))))
      .toDF("record_id", "record_type", "target_uri", "payload")
      .withColumn("warc_date", lit("2026-01-01T00:00:00Z"))
      .withColumn("content_type", lit("application/http; msgtype=response"))
      .coalesce(1).write.format("warc").mode("append")
      .option("compression", "gzip").save(dir)
    val docs = CrawlPipeline.fromWarc(
        spark.read.format("warc").load(dir),
        CrawlPipeline.CrawlSettings(httpEnvelope = true))
      .select($"url", $"title", $"text")
      .as[(String, String, String)].collect().sortBy(_._1).toSeq
    // 404, 301, robots-disallowed /private, image/png, and the
    // 5xx-robots host (f.ex — complete disallow per §2.3.1.4) all
    // drop; the 4xx-robots host (g.ex — unrestricted) passes
    assert(docs.map(_._1) == Seq("http://e.ex/latin/2", "http://e.ex/ok/1",
      "http://g.ex/ok/1"))
    assert(docs.head._2 == "café" &&
      docs.head._3 == content + " café")
    assert(docs(1)._2 == "E1")
  }

  test("fromWarc knobs: robots off keeps the private page; full-text keeps the nav") {
    val records = spark.read.format("warc").load(crawlDir())
    val noRobots = CrawlPipeline.fromWarc(records,
      CrawlPipeline.CrawlSettings(respectRobots = false))
    assert(noRobots.count() == 3)
    assert(noRobots.filter($"url" === "http://h.ex/private/2").count() == 1)
    val full = CrawlPipeline.fromWarc(records,
      CrawlPipeline.CrawlSettings(mainContentOnly = false))
    val t = full.filter($"url" === "http://h.ex/public/1")
      .select($"text").as[String].head()
    assert(t.startsWith("Home About\n"), t.take(30)) // nav text retained
  }

  test("toWet: the one-call WARC->WET job writes linked conversion segments") {
    val in = crawlDir()
    val out = java.nio.file.Files
      .createTempDirectory("graft-wet-one-").toString
    CrawlPipeline.toWet(spark, in, out)
    val wet = spark.read.format("warc").load(out)
    // every response converts (robots + 4 pages); warcinfo is skipped
    assert(wet.count() == 5)
    assert(wet.filter($"record_type" =!= "conversion").count() == 0)
    val p1 = wet.filter($"target_uri" === "http://h.ex/public/1")
    val t = p1.select(decode($"payload", "UTF-8")).as[String].head()
    assert(t.contains(content + " number 1"), t.take(80))
    assert(p1.select(element_at($"headers", "WARC-Refers-To"))
      .as[String].head() == "<urn:c:p1>") // back-link to the page record
  }

  test("toWet httpEnvelope: non-2xx and non-html drop, body slices out of " +
      "the envelope, declared charset decodes") {
    def env(status: String, ct: String, body: String,
        cs: String = "UTF-8"): Array[Byte] =
      s"HTTP/1.1 $status\r\nContent-Type: $ct\r\n\r\n"
        .getBytes("ISO-8859-1") ++ body.getBytes(cs)
    val in = java.nio.file.Files
      .createTempDirectory("graft-wetenv-in-").toString
    Seq(
      ("<urn:w:1>", "http://w.ex/1",
        env("200 OK", "text/html", "<html><body><p>hello wet</p></body></html>")),
      ("<urn:w:2>", "http://w.ex/2",
        env("200 OK", "text/html; charset=iso-8859-1",
          "<html><body><p>café latin</p></body></html>", cs = "ISO-8859-1")),
      ("<urn:w:3>", "http://w.ex/3",
        env("404 Not Found", "text/html", "<html>gone</html>")),
      ("<urn:w:4>", "http://w.ex/4", env("200 OK", "image/png", "xx")))
      .toDF("record_id", "target_uri", "payload")
      .withColumn("record_type", lit("response"))
      .withColumn("warc_date", lit("2026-01-01T00:00:00Z"))
      .withColumn("content_type", lit("application/http; msgtype=response"))
      .coalesce(1).write.format("warc").mode("append")
      .option("compression", "gzip").save(in)
    val out = java.nio.file.Files
      .createTempDirectory("graft-wetenv-out-").toString
    CrawlPipeline.toWet(spark, in, out, httpEnvelope = true)
    val wet = spark.read.format("warc").load(out)
      .select($"target_uri", decode($"payload", "UTF-8").as("t"))
      .as[(String, String)].collect().sortBy(_._1).toSeq
    assert(wet.map(_._1) == Seq("http://w.ex/1", "http://w.ex/2"))
    assert(wet(0)._2 == "hello wet")
    assert(wet(1)._2 == "café latin")
  }

  test("recrawlScheduleStream: live sitemap feed == batch verdicts " +
      "(unlisted stays batch-side), stateless append mode") {
    val smDir = java.nio.file.Files
      .createTempDirectory("graft-smstream-").toString
    // two sitemap files arriving as a stream
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(smDir, "sm1.xml"),
      """<urlset>
        |<url><loc>http://r.ex/new</loc>
        |<lastmod>2026-03-01T00:00:00Z</lastmod></url>
        |<url><loc>http://r.ex/stale</loc>
        |<lastmod>2026-03-01T00:00:00Z</lastmod></url>
        |</urlset>""".stripMargin)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(smDir, "sm2.xml"),
      """<urlset>
        |<url><loc>http://r.ex/fresh</loc>
        |<lastmod>2026-01-01T00:00:00Z</lastmod></url>
        |<url><loc>http://r.ex/nolastmod</loc></url>
        |</urlset>""".stripMargin)
    val crawled = Seq(
      ("http://r.ex/stale", "2026-02-01 00:00:00"),
      ("http://r.ex/fresh", "2026-02-01 00:00:00"),
      ("http://r.ex/nolastmod", "2026-02-01 00:00:00"),
      ("http://r.ex/unlisted", "2026-02-01 00:00:00"))
      .toDF("url", "ft")
      .withColumn("fetch_ts", to_timestamp($"ft")).drop("ft")
    def chain(sitemaps: org.apache.spark.sql.DataFrame) =
      CrawlPipeline.recrawlScheduleStream(
        CrawlPipeline.sitemapEntries(sitemaps, "value"), crawled)
    val q = chain(spark.readStream.option("wholetext", "true").text(smDir))
      .writeStream.format("memory").queryName("recrawl_stream_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("recrawl_stream_out")
      .select($"url", $"verdict").as[(String, String)]
      .collect().sortBy(_._1).toSeq
    val want = chain(spark.read.option("wholetext", "true").text(smDir))
      .select($"url", $"verdict").as[(String, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == want && got == Seq(
      ("http://r.ex/fresh", "fresh"), ("http://r.ex/new", "new"),
      ("http://r.ex/nolastmod", "fresh"), ("http://r.ex/stale", "stale")))
  }

  test("toWet with index=true: WET segments are externally seekable — " +
      "CDX sidecar emitted, random access recovers the conversion record") {
    import graft.sources.warc.WarcRandomAccess
    val in = crawlDir()
    val out = java.nio.file.Files
      .createTempDirectory("graft-wet-idx-").toString
    CrawlPipeline.toWet(spark, in, out, index = true)
    val idx = WarcRandomAccess.readIndex(spark, out)
    // one index row per conversion record (5 responses convert)
    assert(idx.count() == 5, idx.collect().mkString(","))
    // point-lookup ONE page's conversion record by URI, without
    // scanning the segment
    val hit = idx.filter($"target_uri" === "http://h.ex/public/1")
    val rec = WarcRandomAccess.fetch(hit).collect()
    assert(rec.length == 1)
    assert(rec.head.record_type == "conversion")
    assert(new String(rec.head.payload, "UTF-8")
      .contains(content + " number 1"))
  }

  test("fetchRateByMinute: streaming (complete mode) == batch; " +
      "per-minute counts are exact") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-rate-").toString
    def rec(n: Int, host: String, date: String) =
      (s"<urn:r:$n>", "response", s"http://$host/p/$n", date,
        "text/html", s"<p>page $n</p>")
    Seq(
      rec(1, "a.ex", "2026-01-01T00:00:05Z"),
      rec(2, "a.ex", "2026-01-01T00:00:30Z"),
      rec(3, "a.ex", "2026-01-01T00:00:59Z"),
      rec(4, "a.ex", "2026-01-01T00:02:10Z"),
      rec(5, "b.ex", "2026-01-01T00:00:40Z"),
      rec(6, "b.ex", "2026-01-01T00:00:41Z"))
      .toDF("record_id", "record_type", "target_uri", "warc_date",
        "content_type", "body")
      .withColumn("payload", encode(col("body"), "UTF-8")).drop("body")
      .coalesce(1).write.format("warc").mode("append")
      .option("compression", "gzip").save(dir)
    val batch = CrawlPipeline
      .fetchRateByMinute(spark.read.format("warc").load(dir))
      .as[(String, java.sql.Timestamp, Long)].collect().toSet
    val m0 = java.sql.Timestamp.from(
      java.time.Instant.parse("2026-01-01T00:00:00Z"))
    val m2 = java.sql.Timestamp.from(
      java.time.Instant.parse("2026-01-01T00:02:00Z"))
    assert(batch == Set(("a.ex", m0, 3L), ("a.ex", m2, 1L), ("b.ex", m0, 2L)),
      batch.toString)
    val q = CrawlPipeline
      .fetchRateByMinute(spark.readStream.format("warc").load(dir))
      .writeStream.format("memory").queryName("fetch_rate_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("fetch_rate_out")
      .as[(String, java.sql.Timestamp, Long)].collect().toSet
    assert(got == batch, s"stream=$got batch=$batch")
  }

  test("rateViolations: cap is exactly ceil(60/delay); undeclared hosts " +
      "never violate; stream == batch") {
    import graft.operators.Robots
    val dir = java.nio.file.Files
      .createTempDirectory("graft-viol-").toString
    def rec(n: Int, host: String, sec: Int) =
      (s"<urn:v:$n>", "response", s"http://$host/p/$n",
        java.time.Instant.ofEpochSecond(
          java.time.Instant.parse("2026-01-01T00:00:00Z").getEpochSecond
            + sec).toString, "text/html", s"<p>$n</p>")
    // a.ex declares delay 10 → cap 6: SEVEN fetches land in minute 0
    // (violation) and six in minute 1 (exactly at cap, no violation);
    // b.ex declares nothing and hammers anyway
    val recs = ((0 until 7).map(i => rec(i, "a.ex", i * 8)) ++
        (0 until 6).map(i => rec(100 + i, "a.ex", 60 + i * 9)) ++
        (0 until 20).map(i => rec(200 + i, "b.ex", i * 3)))
      .toDF("record_id", "record_type", "target_uri", "warc_date",
        "content_type", "body")
      .withColumn("payload", encode(col("body"), "UTF-8")).drop("body")
    recs.coalesce(1).write.format("warc").mode("append")
      .option("compression", "gzip").save(dir)
    val delays = Robots.parseCrawlDelay(
      Seq(("a.ex", "User-agent: *\nCrawl-delay: 10")).toDF("host", "text"),
      "host", "text", "*")
    val batch = CrawlPipeline
      .rateViolations(spark.read.format("warc").load(dir), delays)
      .select($"host", $"n_fetches", $"cap", $"violation")
      .as[(String, Long, Option[Long], Boolean)].collect().toSet
    assert(batch == Set(("a.ex", 7L, Some(6L), true),
      ("a.ex", 6L, Some(6L), false), ("b.ex", 20L, None, false)),
      batch.toString)
    val q = CrawlPipeline
      .rateViolations(spark.readStream.format("warc").load(dir), delays)
      .writeStream.format("memory").queryName("viol_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("viol_out")
      .select($"host", $"n_fetches", $"cap", $"violation")
      .as[(String, Long, Option[Long], Boolean)].collect().toSet
    assert(got == batch, s"stream=$got batch=$batch")

    // a caller-supplied delays relation carrying delay_s = 0 (real
    // robots files publish 'Crawl-delay: 0'; parseCrawlDelay drops it,
    // but the contract is a (host, delay_s) frame from anywhere) must
    // NOT throw DIVIDE_BY_ZERO under ANSI mode — zero means "no
    // delay", so the cap is null and the host never violates
    val zeroed = Seq(("b.ex", 0L)).toDF("host", "delay_s")
    val z = CrawlPipeline
      .rateViolations(spark.read.format("warc").load(dir), zeroed)
      .filter($"host" === "b.ex")
      .select($"cap", $"violation")
      .as[(Option[Long], Boolean)].collect().toSet
    assert(z == Set((None, false)), z.toString)
  }

  test("hostFetchStats: hand-computed gaps incl. a CROSS-BUCKET min, " +
      "same-second ties, and a single-fetch host") {
    val base = java.time.Instant.parse("2026-03-01T00:00:00Z").getEpochSecond
    def rec(host: String, sec: Long) = (
      s"http://$host/p/$sec",
      java.time.Instant.ofEpochSecond(base + sec).toString)
    // host a: minute buckets [0,5,59] | [61] | [180]; the smallest
    // adjacent gap (61-59=2) STRADDLES a bucket boundary
    val recs = (Seq(0L, 5L, 59L, 61L, 180L).map(rec("a.ex", _)) ++
        Seq(rec("b.ex", 7L)) ++
        Seq(rec("c.ex", 10L), rec("c.ex", 10L), rec("c.ex", 40L)))
      .toDF("target_uri", "warc_date")
    val got = CrawlPipeline.hostFetchStats(recs)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a.ex")
    assert(a.getLong(1) == 5 && a.getLong(2) == base &&
      a.getLong(3) == base + 180)
    assert(a.getLong(4) == 2, s"cross-bucket min gap: ${a.getLong(4)}")
    assert(a.getDouble(5) == 45.0 && a.getLong(6) == 3)
    val b = got("b.ex")
    assert(b.getLong(1) == 1 && b.isNullAt(4) && b.isNullAt(5) &&
      b.getLong(6) == 1)
    val c = got("c.ex") // two fetches in the SAME second → gap 0
    assert(c.getLong(4) == 0 && c.getLong(6) == 3)
  }

  test("hostFetchStats: hierarchical min-gap == naive full-history window " +
      "on a dense deterministic log") {
    import org.apache.spark.sql.expressions.Window
    val base = java.time.Instant.parse("2026-03-01T00:00:00Z").getEpochSecond
    val recs = (0 until 400).map { i =>
      val sec = (i * 173) % 3600 + (i % 3) // collisions + near-ties
      (s"http://h${i % 5}.ex/p/$i",
        java.time.Instant.ofEpochSecond(base + sec).toString)
    }.toDF("target_uri", "warc_date")
    val naive = recs.select(
        lower(regexp_extract($"target_uri", "(?i)^https?://([^/:]+)", 1))
          .as("host"),
        unix_timestamp(to_timestamp($"warc_date")).as("t"))
      .withColumn("gap",
        $"t" - lag($"t", 1).over(Window.partitionBy($"host").orderBy($"t")))
      .groupBy($"host").agg(min($"gap").as("min_gap_s"))
      .as[(String, Long)].collect().toMap
    val got = CrawlPipeline.hostFetchStats(recs)
      .select($"host", $"min_gap_s").as[(String, Long)].collect().toMap
    assert(got == naive, s"got=$got naive=$naive")
  }

  test("frontierSlots: rank per ceil(60/delay) slot; undeclared and junk " +
      "delays fall to the default") {
    val ranks = Seq(("a.ex", 6000L), ("b.ex", 6000L), ("c.ex", 600L),
      ("d.ex", 600L)).toDF("node", "rank")
    val delays = Seq(("a.ex", 10L), ("c.ex", 7L), ("d.ex", 0L))
      .toDF("host", "delay_s")
    val got = CrawlPipeline.frontierSlots(ranks, delays, defaultDelayS = 1L)
      .select($"host", $"pr", $"slots_per_min", $"priority")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // a: delay 10 → 6 slots → 1000/slot; b: default 1 → 60 → 100/slot
    // (equal rank, scarcer budget → a's slots are 10× more valuable)
    // c: delay 7 → ceil(60/7)=9 → 66; d: junk 0 → default → 10
    assert(got == Map(
      "a.ex" -> (6000L, 6L, 1000L), "b.ex" -> (6000L, 60L, 100L),
      "c.ex" -> (600L, 9L, 66L), "d.ex" -> (600L, 60L, 10L)), got.toString)
  }

  test("frontier schedule replay: fetching at EXACTLY the slot budget is " +
      "compliant, one extra fetch per minute violates every minute") {
    import graft.operators.Robots
    // the end-to-end consistency of the politeness arithmetic: a
    // schedule generated FROM parseCrawlDelay's caps must be judged
    // compliant BY rateViolations built from the same delays — i.e.
    // ceil(60/delay) means the same thing to the scheduler and the
    // limiter, including at the boundary (exactly cap fetches = ok)
    val delays = Robots.parseCrawlDelay(Seq(
      ("a.sx", "User-agent: *\nCrawl-delay: 10"),  // cap 6
      ("b.sx", "User-agent: *\nCrawl-delay: 7"),   // cap 9
      ("c.sx", "User-agent: *\nCrawl-delay: 60")   // cap 1
    ).toDF("host", "text"), "host", "text", "*")
    val caps = delays.as[(String, Long)].collect().toMap
      .map { case (h, d) => h -> ((60 + d - 1) / d) }
    val minutes = 5
    def schedule(extra: Int) = caps.toSeq.flatMap { case (h, cap) =>
      for (m <- 0 until minutes; k <- 0 until (cap + extra).toInt)
        yield (s"http://$h/p/$m-$k",
          java.time.Instant.ofEpochSecond(
            java.time.Instant.parse("2026-01-01T00:00:00Z").getEpochSecond
              + m * 60L + (k * 60L / (cap + extra))).toString)
    }.toDF("target_uri", "warc_date")
    val atCap = CrawlPipeline.rateViolations(schedule(0), delays)
      .filter($"violation").count()
    assert(atCap == 0, s"compliant schedule flagged $atCap violations")
    val overCap = CrawlPipeline.rateViolations(schedule(1), delays)
    val flagged = overCap.filter($"violation").count()
    assert(flagged == 3L * minutes,
      s"over-cap schedule should violate every (host, minute): $flagged")
  }

  test("crawlDiff + crawlDiffStream: latest-wins batch audit; the live " +
      "form == batch per-fetch verdicts; stream == batch") {
    // old crawl: u0 (body A, re-fetched later as body B), u1 (body C);
    // new crawl: u0 body A (changed vs latest B!), u1 body C (same),
    // u2 (added); u3 existed only in the old crawl (gone, batch-only)
    def rec(id: String, url: String, date: String, body: String) =
      (s"<urn:d:$id>", "response", url, date, "text/html", body)
    val oldCrawl = Seq(
      rec("o1", "http://d.ex/u0", "2026-01-01T00:00:00Z", "body A"),
      rec("o2", "http://d.ex/u0", "2026-01-03T00:00:00Z", "body B"),
      rec("o3", "http://d.ex/u1", "2026-01-01T00:00:00Z", "body C"),
      rec("o4", "http://d.ex/u3", "2026-01-01T00:00:00Z", "body D"))
      .toDF("record_id", "record_type", "target_uri", "warc_date",
        "content_type", "body")
      .withColumn("payload", encode(col("body"), "UTF-8")).drop("body")
    val newRows = Seq(
      rec("n1", "http://d.ex/u0", "2026-02-01T00:00:00Z", "body A"),
      rec("n2", "http://d.ex/u1", "2026-02-01T00:00:00Z", "body C"),
      rec("n3", "http://d.ex/u2", "2026-02-01T00:00:00Z", "body E"))
    val newCrawl = newRows
      .toDF("record_id", "record_type", "target_uri", "warc_date",
        "content_type", "body")
      .withColumn("payload", encode(col("body"), "UTF-8")).drop("body")
    val batch = CrawlPipeline.crawlDiff(oldCrawl, newCrawl)
      .select($"url", $"status").as[(String, String)].collect().toMap
    // u0's old LATEST fetch is body B, so serving body A again reads
    // changed — the latest-wins point
    assert(batch == Map("http://d.ex/u0" -> "changed",
      "http://d.ex/u1" -> "same", "http://d.ex/u2" -> "added",
      "http://d.ex/u3" -> "gone"), batch.toString)

    val hashes = CrawlPipeline.crawlHashes(oldCrawl)
    val live = CrawlPipeline.crawlDiffStream(newCrawl, hashes)
      .select($"url", $"status").as[(String, String)].collect().toMap
    assert(live == batch - "http://d.ex/u3", live.toString)

    // stream twin over a real WARC landing
    val dir = java.nio.file.Files
      .createTempDirectory("graft-diff-").toString
    newCrawl.coalesce(1).write.format("warc").mode("append")
      .option("compression", "gzip").save(dir)
    val q = CrawlPipeline.crawlDiffStream(
        spark.readStream.format("warc").load(dir), hashes)
      .writeStream.format("memory").queryName("diff_live_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("diff_live_out")
      .select($"url", $"status").as[(String, String)].collect().toMap
    assert(got == live, s"stream=$got batch=$live")
  }

  test("fromWarcStreamPolite: violating minutes divert, stream == batch") {
    import graft.operators.Robots
    val dir = java.nio.file.Files
      .createTempDirectory("graft-polite-").toString
    def rec(n: Int, host: String, sec: Int) =
      (s"<urn:pg:$n>", "response", s"http://$host/p/$n",
        java.time.Instant.ofEpochSecond(
          java.time.Instant.parse("2026-01-01T00:00:00Z").getEpochSecond
            + sec).toString, "text/html", page(n))
    // fast.ex declares delay 10 → cap 6: SEVEN pages in minute 0
    // (diverted) and three in minute 2 (kept); ok.ex declares nothing.
    // The far-future sentinel on a third host pushes the watermark
    // past every real minute so append-mode state flushes in the test.
    val recs = ((0 until 7).map(i => rec(i, "fast.ex", i * 8)) ++
        (0 until 3).map(i => rec(100 + i, "fast.ex", 120 + i * 15)) ++
        (0 until 4).map(i => rec(200 + i, "ok.ex", i * 7)) ++
        Seq(rec(999, "late.ex", 86400)))
      .toDF("record_id", "record_type", "target_uri", "warc_date",
        "content_type", "body")
      .withColumn("payload", encode(col("body"), "UTF-8")).drop("body")
    recs.coalesce(1).write.format("warc").mode("append")
      .option("compression", "gzip").save(dir)
    val rules = Seq.empty[(String, String, Boolean)]
      .toDF("host", "prefix", "allow")
    val delays = Robots.parseCrawlDelay(
      Seq(("fast.ex", "User-agent: *\nCrawl-delay: 10")).toDF("host", "text"),
      "host", "text", "*")

    val (bDocs, bDiv) = CrawlPipeline.fromWarcStreamPolite(
      spark.read.format("warc").load(dir), rules, delays,
      watermark = "0 seconds")
    val wantDocs = bDocs.select($"url").as[String].collect().toSet
    val wantDiv = bDiv.select($"url", $"n_fetches", $"cap")
      .as[(String, Long, Long)].collect().toSet
    assert(wantDocs == ((0 until 3).map(i => s"http://fast.ex/p/${100 + i}") ++
      (0 until 4).map(i => s"http://ok.ex/p/${200 + i}") ++
      Seq("http://late.ex/p/999")).toSet, wantDocs.toString)
    assert(wantDiv == (0 until 7)
      .map(i => (s"http://fast.ex/p/$i", 7L, 6L)).toSet, wantDiv.toString)

    val (sDocs, sDiv) = CrawlPipeline.fromWarcStreamPolite(
      spark.readStream.format("warc").load(dir), rules, delays,
      watermark = "0 seconds")
    val q1 = sDocs.writeStream.format("memory").queryName("polite_docs")
      .outputMode("append").start()
    val q2 = sDiv.writeStream.format("memory").queryName("polite_div")
      .outputMode("append").start()
    q1.processAllAvailable(); q2.processAllAvailable()
    // the sentinel's own minute is the LAST event time, so its window
    // never closes inside the test — append mode holds it back until
    // a later watermark (exactly-once across restarts would emit it
    // then); every CLOSED minute must match the batch twin exactly
    val wantStream = wantDocs - "http://late.ex/p/999"
    // append-mode results flush in the NO-DATA micro-batches that run
    // after the watermark advances past the closed minutes —
    // processAllAvailable doesn't wait for those, so poll
    val deadline = System.currentTimeMillis + 90000
    def counts() = (spark.table("polite_docs").count(),
      spark.table("polite_div").count())
    while (counts() != (wantStream.size.toLong, wantDiv.size.toLong) &&
        System.currentTimeMillis < deadline)
      Thread.sleep(500)
    q1.stop(); q2.stop()
    val gotDocs = spark.table("polite_docs")
      .select($"url").as[String].collect().toSet
    val gotDiv = spark.table("polite_div")
      .select($"url", $"n_fetches", $"cap")
      .as[(String, Long, Long)].collect().toSet
    assert(gotDocs == wantStream, s"stream=$gotDocs batch=$wantStream")
    assert(gotDiv == wantDiv, s"stream=$gotDiv batch=$wantDiv")
  }

  test("revisitRecords: earliest FETCH TIME wins the canonical (not the " +
      "lowest id); distinct payloads stay responses") {
    val records = Seq(
      // same payload, fetched later-by-id but earlier-by-time: rB wins
      ("rA", "response", "http://h.rv/1", "2026-01-02T00:00:00Z", "dup"),
      ("rB", "response", "http://h.rv/2", "2026-01-01T00:00:00Z", "dup"),
      ("rC", "response", "http://h.rv/3", "2026-01-03T00:00:00Z", "dup"),
      ("rD", "response", "http://h.rv/4", "2026-01-01T00:00:00Z", "solo"),
      ("rI", "warcinfo", null, "2026-01-01T00:00:00Z", "meta")
    ).toDF("record_id", "record_type", "target_uri", "warc_date", "body")
      .withColumn("payload", encode($"body", "UTF-8")).drop("body")
    val got = CrawlPipeline.revisitRecords(records)
      .select($"id", $"kind", $"refers_to")
      .as[(String, String, Option[String])].collect().toSet
    assert(got == Set(
      ("rB", "response", None),
      ("rA", "revisit", Some("rB")),
      ("rC", "revisit", Some("rB")),
      ("rD", "response", None)))
  }

  // 60 pages: m1/m2 serve pages 0-19 verbatim (J=1); p1 serves 20-39,
  // p2 serves 30-49 (inter 10, sizes 20/20 -> J = 10/30 = 1/3); solo
  // hosts s0..s9 serve one page each
  private def mirrorFixture = {
    val rows =
      (0 until 20).flatMap(k => Seq(("m1.ex", k.toLong), ("m2.ex", k.toLong))) ++
      (20 until 40).map(k => ("p1.ex", k.toLong)) ++
      (30 until 50).map(k => ("p2.ex", k.toLong)) ++
      (50 until 60).map(k => (s"s${k - 50}.ex", k.toLong))
    rows.toDF("host", "k")
  }

  test("mirrorHosts: full mirror at J=1, partial pair at exact 1/3, " +
      "solo hosts never pair; duplicate fetches don't inflate sizes") {
    // re-fetches: the same (host, key) row twice must not change sizes
    val pages = mirrorFixture.unionByName(
      mirrorFixture.filter($"host" === "m1.ex").limit(5))
    val out = CrawlPipeline.mirrorHosts(pages, "host", "k", threshold = 0.3)
      .select($"host_a", $"host_b", $"size_a", $"size_b", $"inter", $"jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect().toSet
    assert(out == Set(
      ("m1.ex", "m2.ex", 20L, 20L, 20L, 1.0),
      ("p1.ex", "p2.ex", 20L, 20L, 10L, 10.0 / 30.0)))
    // at a 0.5 threshold only the true mirror survives
    val strict = CrawlPipeline.mirrorHosts(pages, "host", "k", threshold = 0.5)
      .select($"host_a", $"host_b").as[(String, String)].collect().toSet
    assert(strict == Set(("m1.ex", "m2.ex")))
  }

  test("mirrorHosts maxKeyDf: a boilerplate key on every host is pruned " +
      "from intersections but keeps voting in sizes (lossy downward)") {
    // key 999 is served by all four content hosts (a parking page)
    val boiler = Seq("m1.ex", "m2.ex", "p1.ex", "p2.ex")
      .map(h => (h, 999L)).toDF("host", "k")
    val pages = mirrorFixture.unionByName(boiler)
    val capped = CrawlPipeline.mirrorHosts(pages, "host", "k",
        threshold = 0.3, maxKeyDf = 2)
      .select($"host_a", $"host_b", $"size_a", $"size_b", $"inter")
      .as[(String, String, Long, Long, Long)].collect().toSet
    // sizes grow to 21 (the boilerplate key counts) but the pruned key
    // never reaches the intersection: m-pair 20/22, p-pair 10/32
    assert(capped == Set(
      ("m1.ex", "m2.ex", 21L, 21L, 20L),
      ("p1.ex", "p2.ex", 21L, 21L, 10L)))
    // without the cap the parking page makes everyone more similar —
    // including cross pairs like (m1, p1) at 1/41 — and would at scale
    // explode quadratically; here just pin that cross pairs appear
    val uncapped = CrawlPipeline.mirrorHosts(pages, "host", "k",
        threshold = 0.0)
      .select($"host_a", $"host_b").as[(String, String)].collect().toSet
    assert(uncapped.contains(("m1.ex", "p1.ex")))
  }

  test("nearMirrorHosts: drifted twin detected at score 1.0; LSH pair " +
      "source == exact prefix source on the fixture") {
    val body = "the quick brown fox jumped over the lazy dog near the " +
      "river bank while seven other foxes watched from the tall grass"
    val pages = ((0 until 12).map(i =>
        ("d1.ex", i.toLong, s"$body page $i")) ++
      (0 until 12).map(i =>
        ("d2.ex", 100L + i, s"$body page $i stamped")) ++ // drifted twin
      (0 until 12).map(i =>
        ("u.ex", 200L + i, s"unrelated content $i entirely different " +
          s"words here nothing shared with anyone at all $i")))
      .toDF("host", "page_id", "text")
    def run(lsh: Boolean) = CrawlPipeline.nearMirrorHosts(pages,
        "host", "page_id", "text", hostThreshold = 0.5, lshPairs = lsh)
      .select($"host_a", $"host_b", $"matched_a", $"matched_b", $"score")
      .as[(String, String, Long, Long, Double)].collect().toSet
    val exact = run(lsh = false)
    assert(exact == Set(("d1.ex", "d2.ex", 12L, 12L, 1.0)), s"exact=$exact")
    assert(run(lsh = true) == exact)
  }

  test("mirrorHostsLsh == mirrorHosts on the fixture (no cap); the " +
      "pre-signature cap drops boilerplate from sizes too") {
    val exact = CrawlPipeline.mirrorHosts(mirrorFixture, "host", "k",
        threshold = 0.3)
      .select($"host_a", $"host_b", $"size_a", $"size_b", $"inter", $"jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect().toSet
    // r=1 banding: the 1/3-similarity pair would miss r=2 bands with
    // P ≈ (1-1/9)^16 ≈ 15% — the equality assertion needs P(miss) =
    // (2/3)^32 ≈ 2e-6; the exact verify absorbs the extra candidates
    val lsh = CrawlPipeline.mirrorHostsLsh(mirrorFixture, "host", "k",
        threshold = 0.3, bands = 32, rowsPerBand = 1)
      .select($"host_a", $"host_b", $"size_a", $"size_b", $"inter", $"jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect().toSet
    assert(lsh == exact, s"lsh=$lsh exact=$exact")
    // LSH cap semantics differ by design: the hot key leaves the
    // universe entirely, so sizes stay 20/20
    val boiler = Seq("m1.ex", "m2.ex", "p1.ex", "p2.ex")
      .map(h => (h, 999L)).toDF("host", "k")
    val capped = CrawlPipeline.mirrorHostsLsh(
        mirrorFixture.unionByName(boiler), "host", "k",
        threshold = 0.3, bands = 32, rowsPerBand = 1, maxKeyDf = 2)
      .select($"host_a", $"host_b", $"size_a", $"size_b", $"inter")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(capped == Set(
      ("m1.ex", "m2.ex", 20L, 20L, 20L),
      ("p1.ex", "p2.ex", 20L, 20L, 10L)))
  }
}

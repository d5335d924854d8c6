package graft.streaming

import graft.SparkSpec
import graft.operators.{Decontaminate, Sampling, TextAnalysis}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The training-data operators that matter for INGEST-TIME processing
  * are narrow (filters/projections) or stream-static broadcast joins,
  * so they run UNCHANGED on a readStream in append mode — this spec
  * pins that composition: the same operator objects, fed a stream,
  * produce exactly their batch output. (Aggregating operators — dedup
  * clustering, repetition stats — are batch/micro-batch territory by
  * design; `EventStream` covers the stateful streaming surface.)
  */
class StreamingPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val docRows: Seq[(Long, String, String)] = (0L until 200L).map { i =>
    val src = s"src${i % 4}"
    val text = if (i % 7 == 0) "the quick brown fox jumps far today"
    else s"document number $i with some words ${"x" * (i % 5).toInt}"
    (i, src, text)
  }

  test("mixture sampling + langId compose on a stream, append mode, == batch") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    val streamed = in.toDF().toDF("doc_id", "source", "text")
    def pipeline(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.langId(
        Sampling.mixtureByHash(df, "doc_id", "source",
          Map("src0" -> 1.0, "src1" -> 0.5), defaultRate = 0.25),
        "doc_id", "text")

    val q = pipeline(streamed)
      .writeStream.format("memory").queryName("mix_out").outputMode("append")
      .start()
    in.addData(docRows.take(120))
    q.processAllAvailable()
    in.addData(docRows.drop(120))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("mix_out").as[(Long, String)].collect().toSet
    val want = pipeline(docRows.toDF("doc_id", "source", "text"))
      .as[(Long, String)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("mixture + streaming near-dup compose: pairs == batch LSH over the survivors") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions._
    // plant near-dups across the mixture survivors: every 11th doc is
    // a suffix-extended copy of doc (i - 11)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val rows: Seq[(Long, String, String)] = (0L until 100L).map { i =>
      val text = if (i % 11 == 0) base + (" pad" * (i % 2).toInt)
      else s"unique document $i " + (0 to 12).map(j => s"w$i$j").mkString(" ")
      (i, s"src${i % 4}", text)
    }
    val in = MemoryStream[(Long, String, String)]
    val streamed = in.toDF().toDF("doc_id", "source", "text")
      .withColumn("ts", expr("timestamp_millis(3600000 + doc_id * 1000)"))
      .withWatermark("ts", "10 minutes")
    val mixed = Sampling.mixtureByHash(streamed, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 1.0), defaultRate = 0.5)
    val q = EventStream.nearDupStream(mixed, "doc_id", "text", "ts",
        k = 3, threshold = 0.8, bands = 16, rowsPerBand = 2)
      .writeStream.format("memory").queryName("mixdup_out")
      .outputMode("append").start()
    in.addData(rows.take(60))
    q.processAllAvailable()
    in.addData(rows.drop(60))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("mixdup_out")
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val batchMixed = Sampling.mixtureByHash(
      rows.toDF("doc_id", "source", "text"), "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 1.0), defaultRate = 0.5)
    val want = graft.operators.Dedup.minhashLshPairs(
        batchMixed, "doc_id", "text", k = 3, threshold = 0.8,
        bands = 16, rowsPerBand = 2)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(want.nonEmpty, "fixture must keep some planted near-dup pairs")
    assert(got == want, s"stream=${got.toSeq.sorted} batch=${want.toSeq.sorted}")
  }

  test("stream-side decontamination: broadcast eval probe works per micro-batch") {
    implicit val sc = spark.sqlContext
    val evalSet = Seq((1L, "the quick brown fox jumps far")).toDF("doc_id", "text")
    val in = MemoryStream[(Long, String, String)]
    val streamed = in.toDF().toDF("doc_id", "source", "text")
    // contaminated() aggregates per doc — fine in update/complete mode;
    // the ingest-time form is the FILTER (keep clean docs), which is a
    // stream-static left-anti... not supported in append streams, so the
    // standard composition is an inner flag-join inversion: keep docs
    // with zero shared shingles via the broadcast bloom/set probe at
    // the row level. Here: flag rows whose shingles hit the eval set.
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    val evalShingles = evalSet
      .select(explode(TextFunctions.shingleSet(col("text"), 3)).as("sh"))
      .distinct().as[String].collect().toSet
    val hit = udf((t: String) => {
      // the broadcast-set probe, as an ingest-time row filter
      val words = t.split(" ", -1)
      words.sliding(3).exists(w => w.length == 3 && evalShingles(w.mkString(" ")))
    })
    val q = streamed.filter(!hit(col("text")))
      .select(col("doc_id"))
      .writeStream.format("memory").queryName("clean_out").outputMode("append")
      .start()
    in.addData(docRows)
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("clean_out").as[Long].collect().toSet
    val batchKept = Decontaminate.decontaminate(
        docRows.toDF("doc_id", "source", "text"), evalSet, "doc_id", "text", k = 3)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(kept == batchKept)
    assert(docRows.filter(_._1 % 7 == 0).map(_._1).toSet.intersect(kept).isEmpty)
  }

  test("CorpusStream.run: full ingest chain across micro-batches == the batch chain") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions._
    def t(min: Int) = new java.sql.Timestamp(3600000L + min * 60000L)
    val longBase = ("the cats and dogs run to a tree in town " * 6).trim
    val evalPhrase = "zebras graze beside the quiet river bend"
    // per-id fates: src b -> mixture-dropped; short text -> gopher-
    // dropped; eval phrase inside -> decontaminated; 10 duplicates 2's
    // text and arrives in batch 2 -> deduped
    val rows: Seq[(Long, java.sql.Timestamp, String, String)] =
      (0L until 12L).map { i =>
        val src = if (i == 5L || i == 11L) "b" else "a"
        val text =
          if (i == 10L) longBase + " copy two"
          else if (i == 4L) "tiny text"
          else if (i == 7L) longBase + " " + evalPhrase
          else longBase + (if (i == 2L) " copy two" else s" item i$i")
        (i, t(i.toInt), src, text)
      }
    val evalDf = Seq((99L, evalPhrase)).toDF("doc_id", "text")
    val settings = CorpusStream.StreamSettings(
      mixtureRates = Map("a" -> 1.0), defaultRate = 0.0)

    val in = MemoryStream[(Long, java.sql.Timestamp, String, String)]
    val stream = CorpusStream.run(
      in.toDF().toDF("doc_id", "ts", "source", "text")
        .withWatermark("ts", "10 minutes"),
      Some(evalDf), settings)
    val q = stream.writeStream.format("memory").queryName("corpus_stream_out")
      .outputMode("append").start()
    in.addData(rows.take(8): _*)
    q.processAllAvailable()
    in.addData(rows.drop(8): _*) // doc 10 dedups against batch-1 state
    q.processAllAvailable()
    q.stop()
    val got = spark.table("corpus_stream_out")
      .select(col("doc_id")).as[Long].collect().toSet

    // the batch chain, each stage the library's own primitive
    val docsDf = rows.toDF("doc_id", "ts", "source", "text")
    val b1 = Sampling.mixtureByHash(docsDf, "doc_id", "source",
      settings.mixtureRates, settings.defaultRate)
    val b2 = b1.filter(TextAnalysis.gopherPass(col("text")))
    val b3 = Decontaminate.decontaminate(b2, evalDf, "doc_id", "text", k = 3)
    val want = graft.operators.Dedup.exactCanonical(b3, "doc_id", "text")
      .filter(col("doc_id") === col("canonical_id"))
      .select(col("doc_id")).as[Long].collect().toSet

    assert(got == want, s"stream=${got.toSeq.sorted} batch=${want.toSeq.sorted}")
    // every stage dropped its intended victim
    assert(!got.contains(5L) && !got.contains(11L)) // src b
    assert(!got.contains(4L))  // gopher: 2 words
    assert(!got.contains(7L))  // contaminated
    assert(got.contains(2L) && !got.contains(10L)) // exact dup, first kept
    assert(got.contains(0L) && got.contains(1L))
  }

  test("crawl chain end-to-end: WARC segments -> htmlText -> CorpusStream, exactly-once") {
    // the real Common Crawl shape, every stage this library's own
    // primitive: .warc.gz segments land in a directory -> streaming
    // WARC source -> HTML extraction -> quality gate ->
    // decontamination -> exact dedup, across segment boundaries
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    def tmpDir(): String =
      java.nio.file.Files.createTempDirectory("graft-crawl-").toString
    val longBase = ("the cats and dogs run to a tree in town " * 6).trim
    val evalPhrase = "zebras graze beside the quiet river bend"
    def pageHtml(i: Long, text: String): String =
      s"""<html><head><title>Page $i</title><style>.nav{}</style>
         |<script>nav("<div>");</script></head><body>
         |<div class="nav"><a href="/">Home</a></div>
         |<p>$text</p></body></html>""".stripMargin
    // fates: 4 too short (gopher), 7 contaminated, 10 duplicates 2's
    // page text and arrives in the SECOND segment (cross-batch state)
    val rows: Seq[(Long, String)] = (0L until 12L).map { i =>
      val text =
        if (i == 10L) longBase + " copy two"
        else if (i == 4L) "tiny text"
        else if (i == 7L) longBase + " " + evalPhrase
        else longBase + (if (i == 2L) " copy two" else s" item i$i")
      (i, text)
    }
    def landSegment(landing: String, name: String,
        rs: Seq[(Long, String)]): Unit = {
      val stage = tmpDir()
      val info = Seq(("<urn:info>", "warcinfo", null: String,
        "2026-01-01T00:00:00Z", "application/warc-fields", "graft"))
      val resp = rs.map { case (i, text) =>
        (s"<urn:p:$i>", "response", s"http://crawl.example/page/$i",
          f"2026-01-01T00:${i}%02d:00Z", "text/html", pageHtml(i, text))
      }
      (info ++ resp)
        .toDF("record_id", "record_type", "target_uri", "warc_date",
          "content_type", "body")
        .withColumn("payload", encode(col("body"), "UTF-8")).drop("body")
        .coalesce(1).write.format("warc").mode("append")
        .option("compression", "gzip").save(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.startsWith("part-")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(landing, name))
    }
    val landing = tmpDir()
    landSegment(landing, "seg-001.warc.gz", rows.take(8))
    val evalDf = Seq((99L, evalPhrase)).toDF("doc_id", "text")

    val docs = spark.readStream.format("warc").load(landing)
      .filter(col("record_type") === "response")
      .select(
        regexp_extract(col("target_uri"), "(\\d+)$", 1).cast("long").as("doc_id"),
        to_timestamp(col("warc_date")).as("ts"),
        lit("crawl").as("source"),
        TextFunctions.htmlText(decode(col("payload"), "UTF-8")).as("text"))
      .withWatermark("ts", "10 minutes")
    val q = CorpusStream.run(docs, Some(evalDf), CorpusStream.StreamSettings())
      .writeStream.format("memory").queryName("crawl_out")
      .outputMode("append").start()
    q.processAllAvailable()
    landSegment(landing, "seg-002.warc.gz", rows.drop(8))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("crawl_out")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    assert(got.map(_._1).toSet == Set(0L, 1L, 2L, 3L, 5L, 6L, 8L, 9L, 11L),
      s"got ${got.map(_._1).sorted.mkString(",")}")
    // extraction really ran: nav anchor text present as its own block,
    // markup/script/style/title content all gone
    got.foreach { case (i, t) =>
      assert(t.startsWith("Home\n"), t.take(40))
      assert(!t.contains("<") && !t.contains("nav(") && !t.contains("Page "))
    }
  }

  test("governance chain: WARC -> polite gate -> parquet hop -> " +
      "CorpusStream, violating fetches never reach the corpus") {
    // the full live-governance composition, two-hop by design: the
    // gate's windowed aggregation is one stateful operator, the
    // corpus chain's dedup is another — they chain through a parquet
    // landing (the stream-ingest / batch-curate split CorpusStream's
    // own scaladoc prescribes), each hop exactly-once on its own
    // checkpoint. Batch twin: the identical composition on batch
    // frames must produce the identical corpus.
    import org.apache.spark.sql.functions._
    import graft.operators.{CrawlPipeline, Robots}
    def tmpDir(): String =
      java.nio.file.Files.createTempDirectory("graft-gov-").toString
    val longBase = ("the cats and dogs run to a tree in town " * 6).trim
    def rec(n: Int, host: String, sec: Int, text: String) =
      (s"<urn:gv:$n>", "response", s"http://$host/p/$n",
        java.time.Instant.ofEpochSecond(
          java.time.Instant.parse("2026-01-01T00:00:00Z").getEpochSecond
            + sec).toString, "text/html",
        s"<html><head><title>P$n</title></head><body><p>$text</p></body></html>")
    // fast.ex declares delay 10 (cap 6): SEVEN fetches in minute 0 →
    // all divert at the gate. ok.ex: four pages, two sharing one text
    // (the later one dedups in the corpus chain). Sentinel closes the
    // windows.
    // "wonderful" keeps mean word length >= 3.0 (the Gopher bound the
    // bare 3-chars/word base text sits exactly on)
    val recs = ((0 until 7).map(i =>
        rec(i, "fast.ex", i * 8, longBase + s" wonderful item f$i")) ++
      Seq(rec(100, "ok.ex", 10, longBase + " wonderful item alpha"),
        rec(101, "ok.ex", 80, longBase + " wonderful item bravo"),
        rec(102, "ok.ex", 150, longBase + " wonderful item alpha"), // dup
        rec(103, "ok.ex", 220, longBase + " wonderful item charlie"),
        rec(999, "late.ex", 86400, longBase + " wonderful sentinel")))
    val warcDir = tmpDir()
    recs.toDF("record_id", "record_type", "target_uri", "warc_date",
        "content_type", "body")
      .withColumn("payload", encode(col("body"), "UTF-8")).drop("body")
      .coalesce(1).write.format("warc").mode("append")
      .option("compression", "gzip").save(warcDir)
    val rules = Seq.empty[(String, String, Boolean)]
      .toDF("host", "prefix", "allow")
    val delays = Robots.parseCrawlDelay(
      Seq(("fast.ex", "User-agent: *\nCrawl-delay: 10")).toDF("host", "text"),
      "host", "text", "*")

    // hop 1: the gate, WARC stream -> allowed docs -> parquet landing
    val landed = tmpDir()
    val ckpt1 = tmpDir()
    val (gateDocs, _) = CrawlPipeline.fromWarcStreamPolite(
      spark.readStream.format("warc").load(warcDir), rules, delays,
      watermark = "0 seconds")
    val q1 = gateDocs.writeStream.format("parquet")
      .option("path", landed).option("checkpointLocation", ckpt1)
      .outputMode("append").start()
    q1.processAllAvailable()
    val deadline1 = System.currentTimeMillis + 90000
    // all CLOSED minutes flush: 4 ok.ex docs (the sentinel's own
    // minute stays open)
    def landedCount(): Long =
      try spark.read.parquet(landed).count() catch { case _: Throwable => 0L }
    while (landedCount() < 4 && System.currentTimeMillis < deadline1)
      Thread.sleep(500)
    q1.stop()
    assert(landedCount() >= 4,
      s"gate landing holds ${landedCount()} rows after flush")

    // hop 2: the corpus chain over the landing (exact dedup on)
    val schema = spark.read.parquet(landed).schema
    val docs = spark.readStream.schema(schema).parquet(landed)
      .withWatermark("ts", "2 days")
    val q2 = CorpusStream.run(docs, None,
        CorpusStream.StreamSettings(defaultRate = 1.0))
      .writeStream.format("memory").queryName("gov_out")
      .outputMode("append").start()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.table("gov_out")
      .select(col("url")).as[String].collect().toSet

    // batch twin of the GATE (the corpus chain's stream ≡ batch pins
    // live in the tests above; dropDuplicatesWithinWatermark itself
    // has no batch form) + the dedup fate applied explicitly: the
    // corpus is the gate's allowed set minus the later duplicate,
    // minus the sentinel (its minute never closed in the stream)
    val (bDocs, _) = CrawlPipeline.fromWarcStreamPolite(
      spark.read.format("warc").load(warcDir), rules, delays,
      watermark = "0 seconds")
    val want = bDocs.select(col("url")).as[String].collect().toSet -
      "http://late.ex/p/999" - "http://ok.ex/p/102"
    assert(got == want, s"stream=$got want=$want")
    // governance holds end-to-end: no violating fetch in the corpus,
    // and the duplicate collapsed to its first fetch
    assert(!got.exists(_.contains("fast.ex")), got.toString)
    assert(got.contains("http://ok.ex/p/100") &&
      !got.contains("http://ok.ex/p/102"), got.toString)
    assert(got.contains("http://ok.ex/p/101") &&
      got.contains("http://ok.ex/p/103"), got.toString)
  }
}

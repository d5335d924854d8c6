package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WARC source/sink: round-trips (plain + per-record-gzip), real-world
  * framing tolerance (bare-LF headers), fail-fast on truncation, and
  * the pruned-scan projection.
  */
class WarcSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-warc-spec-").toString

  private def sampleDf = Seq(
    ("<urn:x:1>", "response", "http://a.example/p1", "2026-01-01T00:00:00Z",
      "text/html", Map("X-Crawl" -> "seg-0"), "hello warc"),
    ("<urn:x:2>", "response", "http://b.example/p2", "2026-01-01T00:00:01Z",
      "text/plain", Map.empty[String, String], "payload two\nwith a newline"),
    ("<urn:x:3>", "warcinfo", null, "2026-01-01T00:00:02Z",
      "application/warc-fields", Map.empty[String, String], "software: graft")
  ).toDF("record_id", "record_type", "target_uri", "warc_date",
      "content_type", "headers", "body")
    .withColumn("payload", encode(col("body"), "UTF-8")).drop("body")

  private def roundTrip(compression: Option[String]): Unit = {
    val dir = tmpDir()
    val w = sampleDf.coalesce(1).write.format("warc").mode("append")
    compression.fold(w)(c => w.option("compression", c)).save(dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
    assert(files.length == 1)
    val expectExt = if (compression.isDefined) ".warc.gz" else ".warc"
    assert(files.head.getName.endsWith(expectExt), files.head.getName)
    val back = spark.read.format("warc").load(dir)
      .select($"record_id", $"record_type", $"target_uri", $"warc_date",
        $"content_type", $"content_length", $"headers",
        decode($"payload", "UTF-8").as("body"))
      .orderBy($"record_id")
      .as[(String, String, String, String, String, Long, Map[String, String], String)]
      .collect()
    assert(back.length == 3)
    assert(back(0)._1 == "<urn:x:1>")
    assert(back(0)._3 == "http://a.example/p1")
    assert(back(0)._6 == "hello warc".getBytes("UTF-8").length.toLong)
    assert(back(0)._7("X-Crawl") == "seg-0") // extra header survives
    assert(back(0)._8 == "hello warc")
    assert(back(1)._8 == "payload two\nwith a newline") // payload bytes exact
    assert(back(2)._2 == "warcinfo")
    assert(back(2)._3 == null) // warcinfo has no target URI
  }

  test("round-trip: plain .warc") { roundTrip(None) }

  test("round-trip: .warc.gz with one gzip member per record") {
    roundTrip(Some("gzip"))
    // and the member layout really is per-record: concatenated members
    // must each decode — a single-member file would decode too, so pin
    // the member COUNT by walking gzip headers at decoder boundaries
    val dir = tmpDir()
    sampleDf.coalesce(1).write.format("warc").mode("append")
      .option("compression", "gzip").save(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    // walk members with a raw Inflater (GZIPInputStream would swallow
    // the concatenation): 10-byte fixed header (default flags), deflate
    // body, 8-byte trailer
    var members = 0
    var offset = 0
    while (offset < bytes.length) {
      assert((bytes(offset) & 0xff) == 0x1f && (bytes(offset + 1) & 0xff) == 0x8b,
        s"no gzip magic at member $members offset $offset")
      assert(bytes(offset + 3) == 0, "unexpected gzip header flags")
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(bytes, offset + 10, bytes.length - offset - 10)
      val buf = new Array[Byte](4096)
      while (!inf.finished()) inf.inflate(buf)
      offset += 10 + inf.getBytesRead.toInt + 8
      inf.end()
      members += 1
    }
    assert(members == 3, s"expected 3 gzip members, got $members")
  }

  test("member index sidecar: seek(offset) + read(length) + gunzip recovers exactly one record") {
    val dir = tmpDir()
    sampleDf.coalesce(1).write.format("warc").mode("append")
      .option("compression", "gzip").option("index", "true").save(dir)
    val files = new java.io.File(dir).listFiles()
    val seg = files.filter(_.getName.endsWith(".warc.gz")).head
    val cdx = files.filter(_.getName.endsWith(".cdx")).head
    val lines = java.nio.file.Files.readAllLines(cdx.toPath)
    assert(lines.size == 3, s"one index line per record: $lines")
    // the sidecar never leaks into a read of the directory
    assert(spark.read.format("warc").load(dir).count() == 3)
    val segBytes = java.nio.file.Files.readAllBytes(seg.toPath)
    var covered = 0L
    for (line <- lines.toArray(Array.empty[String])) {
      val Array(uri, rid, json) = line.split("\t", 3)
      val offset = """"offset": (\d+)""".r.findFirstMatchIn(json).get.group(1).toLong
      val length = """"length": (\d+)""".r.findFirstMatchIn(json).get.group(1).toLong
      assert(json.contains(s""""filename": "${seg.getName}""""))
      // the random-access contract: this slice alone is a gzip member
      val slice = segBytes.slice(offset.toInt, (offset + length).toInt)
      val rec = new String(
        new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(slice)).readAllBytes(),
        "UTF-8")
      assert(rec.startsWith("WARC/1.0\r\n"))
      if (rid != "-") assert(rec.contains(s"WARC-Record-ID: $rid"))
      if (uri != "-") assert(rec.contains(s"WARC-Target-URI: $uri"))
      covered += length
    }
    // offsets+lengths tile the whole segment: nothing unindexed
    assert(covered == segBytes.length.toLong)
  }

  test("WET conversion: responses become linked text/plain conversion records, one narrow pass") {
    import graft.sources.warc.Wet
    val dir = tmpDir()
    val wetDir = tmpDir() + "/wet"
    Seq(
      ("<urn:x:1>", "response", "http://a.example/p1", "2026-01-01T00:00:00Z",
        "text/html",
        "<html><head><title>T</title><script>x()</script></head>" +
          "<body><p>alpha &amp; beta</p><p>two</p></body></html>"),
      ("<urn:x:9>", "warcinfo", null, "2026-01-01T00:00:01Z",
        "application/warc-fields", "software: graft") // non-response: dropped
    ).toDF("record_id", "record_type", "target_uri", "warc_date",
        "content_type", "body")
      .withColumn("payload", encode(col("body"), "UTF-8")).drop("body")
      .coalesce(1).write.format("warc").mode("append").save(dir)

    Wet.convert(spark.read.format("warc").load(dir))
      .coalesce(1).write.format("warc").mode("append")
      .option("compression", "gzip").save(wetDir)

    val wet = spark.read.format("warc").load(wetDir)
      .select($"record_id", $"record_type", $"target_uri", $"content_type",
        $"headers", decode($"payload", "UTF-8").as("text"))
      .as[(String, String, String, String, Map[String, String], String)]
      .collect()
    assert(wet.length == 1)
    val r = wet.head
    assert(r._1.startsWith("<urn:wet:") && r._1.endsWith(">"))
    assert(r._2 == "conversion" && r._4 == "text/plain")
    assert(r._3 == "http://a.example/p1")
    assert(r._5("WARC-Refers-To") == "<urn:x:1>")
    assert(r._6 == "alpha & beta\ntwo") // extracted, not the markup
    // deterministic mint: a re-run produces the same record id
    val again = Wet.convert(spark.read.format("warc").load(dir))
      .select($"record_id").as[String].head()
    assert(again == r._1)
  }

  test("CDX random access: index lookup + range read reproduce the scan, gz and plain") {
    import graft.sources.warc.WarcRandomAccess
    for (gz <- Seq(true, false)) {
      val dir = tmpDir()
      val w = sampleDf.coalesce(1).write.format("warc").mode("append")
        .option("index", "true")
      (if (gz) w.option("compression", "gzip") else w).save(dir)
      val idx = WarcRandomAccess.readIndex(spark, dir)
      assert(idx.count() == 3)
      // a record with no URI lands as a null cell, not the literal '-'
      assert(idx.filter($"target_uri".isNull).count() == 1)
      // point lookup: one record's bytes, nothing scanned
      val hit = WarcRandomAccess.fetch(
        idx.filter($"target_uri" === "http://b.example/p2")).collect()
      assert(hit.length == 1 && hit.head.record_id == "<urn:x:2>")
      assert(new String(hit.head.payload, "UTF-8") ==
        "payload two\nwith a newline")
      // fetching the whole index == the scan-side read
      val viaIndex = WarcRandomAccess.fetch(idx).collect()
        .map(r => (r.record_id, r.record_type,
          new String(r.payload, "UTF-8"))).sorted
      val viaScan = spark.read.format("warc").load(dir)
        .select($"record_id", $"record_type",
          decode($"payload", "UTF-8").as("body"))
        .as[(String, String, String)].collect().sorted
      assert(viaIndex.toSeq == viaScan.toSeq)
    }
  }

  test("persisted CDX index: parquet sidecar-as-table fetches the same " +
      "records as the text parse; URI filter pushes into the scan") {
    import graft.sources.warc.WarcRandomAccess
    val dir = tmpDir()
    sampleDf.coalesce(1).write.format("warc").mode("append")
      .option("index", "true").option("compression", "gzip").save(dir)
    val path = WarcRandomAccess.persistIndex(spark, dir, partitions = 2)
    assert(path.endsWith("/_cdxindex"))
    assert(new java.io.File(path).isDirectory)
    val persisted = WarcRandomAccess.readPersistedIndex(spark, dir)
    // same relation as the text parse
    val a = WarcRandomAccess.readIndex(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val b = persisted.collect().map(_.toString).sorted.toSeq
    assert(a == b)
    // drop-in front of fetch
    val hit = WarcRandomAccess.fetch(
      persisted.filter($"target_uri" === "http://b.example/p2")).collect()
    assert(hit.length == 1 && hit.head.record_id == "<urn:x:2>")
    // the point-lookup predicate reaches the parquet scan
    val plan = persisted.filter($"target_uri" === "http://b.example/p2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("target_uri"),
      plan.take(500))
    // the underscore-prefixed index dir is invisible to the segment scan
    assert(spark.read.format("warc").load(dir).count() == 3)
  }

  test("persistIndexStream: sidecars arriving across micro-batches " +
      "append to the parquet index; fetch sees every landed segment") {
    import graft.sources.warc.WarcRandomAccess
    val landing = tmpDir()
    val stage = tmpDir()
    // two "crawl drops": segment+sidecar pairs staged then moved in
    for ((drop, off) <- Seq("d1" -> 0, "d2" -> 100)) {
      sampleDf.withColumn("record_id",
          regexp_replace($"record_id", "x:", s"x$off:"))
        .coalesce(1).write.format("warc").mode("append")
        .option("index", "true").option("compression", "gzip")
        .save(s"$stage/$drop")
    }
    // each drop lands as its own subdirectory — sidecar filenames
    // stay intact so indexFromFileLines resolves segments correctly
    def land(drop: String): Unit = {
      val d = new java.io.File(s"$landing/$drop"); d.mkdirs()
      new java.io.File(s"$stage/$drop").listFiles().foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(d.getPath, f.getName))
      }
    }
    val ckpt = tmpDir() + "/ckpt"
    val q = WarcRandomAccess.persistIndexStream(spark, landing,
      ckpt, landingGlob = s"$landing/*/*.cdx")
    land("d1"); q.processAllAvailable()
    val afterOne = WarcRandomAccess.readPersistedIndex(spark, landing).count()
    assert(afterOne == 3, s"afterOne=$afterOne")
    land("d2"); q.processAllAvailable()
    // compaction refuses while the stream still writes the tail
    val guard = intercept[IllegalArgumentException] {
      WarcRandomAccess.compactIndex(spark, landing)
    }
    assert(guard.getMessage.contains("stop it before"), guard.getMessage)
    q.stop()
    val idx = WarcRandomAccess.readPersistedIndex(spark, landing)
    assert(idx.count() == 6)
    // the streamed index fetches every record the landed segments hold
    val got = WarcRandomAccess.fetch(idx).collect()
      .map(_.record_id).sorted.toSeq
    val want = (for (off <- Seq(0, 100); i <- 1 to 3)
      yield s"<urn:x$off:$i>").sorted
    assert(got == want, s"got=$got")
    // compact: tail folds into the range-partitioned base, tail (and
    // its _spark_metadata sink log) retires — same six rows after
    val basePath = WarcRandomAccess.compactIndex(spark, landing,
      partitions = 2)
    assert(!new java.io.File(s"$landing/_cdxindex-live").exists())
    assert(!new java.io.File(s"$basePath/_spark_metadata").exists())
    assert(WarcRandomAccess.readPersistedIndex(spark, landing)
      .count() == 6)
    // restart with the SAME checkpoint: seen-file tracking skips the
    // ingested sidecars (no re-ingest = no duplicates), a fresh tail
    // catches the new drop, and the reader unions base + tail
    sampleDf.withColumn("record_id",
        regexp_replace($"record_id", "x:", "x200:"))
      .coalesce(1).write.format("warc").mode("append")
      .option("index", "true").option("compression", "gzip")
      .save(s"$stage/d3")
    val q2 = WarcRandomAccess.persistIndexStream(spark, landing,
      ckpt, landingGlob = s"$landing/*/*.cdx")
    land("d3"); q2.processAllAvailable()
    q2.stop()
    val after = WarcRandomAccess.readPersistedIndex(spark, landing)
    val got2 = WarcRandomAccess.fetch(after).collect()
      .map(_.record_id).sorted.toSeq
    val want2 = (for (off <- Seq(0, 100, 200); i <- 1 to 3)
      yield s"<urn:x$off:$i>").sorted
    assert(got2 == want2, s"got2=$got2")
  }

  test("CDX index parse survives untrusted garbage: overflowing offsets " +
      "null out (no ANSI CAST_OVERFLOW) and fetch skips corrupt rows") {
    import graft.sources.warc.WarcRandomAccess
    val dir = tmpDir()
    sampleDf.coalesce(1).write.format("warc").mode("append")
      .option("compression", "gzip").option("index", "true").save(dir)
    // append a garbage line an external (Common Crawl-style) sidecar
    // could carry: a 25-digit offset that overflows BIGINT
    val cdx = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".cdx")).head
    val seg = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head.getName
    java.nio.file.Files.writeString(cdx.toPath,
      "http://junk2.example/x\t<urn:junk2>\t" +
        s"""{"filename": "$seg", "offset": "9999999999999999999999999", "length": "10"}""" +
        "\n",
      java.nio.file.StandardOpenOption.APPEND)
    // the raw append invalidates Hadoop LocalFS's .crc sidecar — drop
    // it (an external sidecar wouldn't have one in the first place)
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val idx = WarcRandomAccess.readIndex(spark, dir)
    // the garbage rows parse (null offset), the good rows are intact
    assert(idx.filter($"offset".isNull).count() >= 1)
    assert(idx.filter($"offset".isNotNull).count() == 3)
    // fetch skips the unfetchable rows instead of dying
    val got = WarcRandomAccess.fetch(idx).collect()
    assert(got.length == 3, got.map(_.record_id).mkString(","))
  }

  test("streaming selective ingest: arriving CDX indexes stream, predicate picks records, fetch range-reads them") {
    import graft.sources.warc.WarcRandomAccess
    val landing = tmpDir()
    val out = tmpDir() + "/picked"
    def landIndexed(name: String, ids: Range): Unit = {
      val stage = tmpDir()
      ids.map(i => (s"<urn:x:$i>", "response", s"http://ex/$i",
          "2026-01-01T00:00:00Z", "text/plain",
          s"body $i"))
        .toDF("record_id", "record_type", "target_uri", "warc_date",
          "content_type", "body")
        .withColumn("payload", encode(col("body"), "UTF-8")).drop("body")
        .coalesce(1).write.format("warc").mode("append")
        .option("compression", "gzip").option("index", "true").save(stage)
      // each segment directory lands whole, sidecar beside its segment
      java.nio.file.Files.move(java.nio.file.Paths.get(stage),
        java.nio.file.Paths.get(landing, name))
    }
    landIndexed("seg-001", 0 until 6)
    // the built-in file stream source tails the cdx sidecars; each
    // micro-batch filters ODD ids and fetches only those records
    val q = spark.readStream.text(landing + "/*/*.cdx")
      .writeStream.option("checkpointLocation", tmpDir() + "/ck")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val idx = WarcRandomAccess.indexFromFileLines(batch)
          .filter(regexp_extract(col("target_uri"), "(\\d+)$", 1)
            .cast("long") % 2 === 1)
        WarcRandomAccess.fetch(idx).toDF()
          .select(col("record_id"), decode(col("payload"), "UTF-8").as("body"))
          .write.mode("append").parquet(out)
      }.start()
    q.processAllAvailable()
    landIndexed("seg-002", 6 until 10)
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(out)
      .as[(String, String)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq ==
      Seq(1, 3, 5, 7, 9).map(i => s"<urn:x:$i>"), got.mkString(","))
    assert(got.forall { case (id, body) =>
      body == "body " + id.stripPrefix("<urn:x:").stripSuffix(">") })
  }

  test("streaming read: arriving segments become micro-batches; restart from checkpoint is exact") {
    def landSegment(landing: String, name: String, ids: Range): Unit = {
      val stage = tmpDir()
      ids.map(i => (s"<urn:x:$i>", "response", s"http://ex/$i",
          "2026-01-01T00:00:00Z", "text/plain",
          Map.empty[String, String], s"doc $i"))
        .toDF("record_id", "record_type", "target_uri", "warc_date",
          "content_type", "headers", "body")
        .withColumn("payload", encode(col("body"), "UTF-8")).drop("body")
        .coalesce(1).write.format("warc").mode("append").save(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.startsWith("part-")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(landing, name))
    }
    val landing = tmpDir()
    val ckpt = tmpDir()
    val out = tmpDir() + "/out"
    landSegment(landing, "seg-001.warc", 0 until 3)

    def startQuery() = spark.readStream.format("warc").load(landing)
      .select($"record_id", decode($"payload", "UTF-8").as("body"))
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", out)
      .start()

    val q1 = startQuery()
    q1.processAllAvailable()
    assert(spark.read.parquet(out).count() == 3)

    // a new segment lands while the query runs → exactly its records append
    landSegment(landing, "seg-002.warc", 3 until 8)
    q1.processAllAvailable()
    assert(spark.read.parquet(out).count() == 8)
    q1.stop()

    // a segment lands while the query is DOWN; restart from the same
    // checkpoint picks it up with no duplicates of earlier batches
    landSegment(landing, "seg-003.warc", 8 until 10)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out)
      .select($"record_id", $"body").as[(String, String)].collect().sorted
    assert(got.length == 10, s"expected 10 exactly-once records, got ${got.length}")
    assert(got.map(_._1).distinct.length == 10)
    assert(got.head == (("<urn:x:0>", "doc 0")))
  }

  test("bare-LF headers (non-CRLF crawls) parse identically") {
    val dir = tmpDir()
    val body = "lf payload"
    val rec = s"WARC/1.0\nWARC-Type: resource\nWARC-Record-ID: <urn:lf:1>\n" +
      s"Content-Length: ${body.length}\n\n$body\n\n"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "lf.warc"), rec.getBytes("UTF-8"))
    val back = spark.read.format("warc").load(dir)
      .select($"record_id", decode($"payload", "UTF-8")).as[(String, String)]
      .collect()
    assert(back.toSeq == Seq(("<urn:lf:1>", body)))
  }

  test("truncated payload fails fast with the file named") {
    val dir = tmpDir()
    val rec = "WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 100\r\n\r\nshort"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "bad.warc"), rec.getBytes("UTF-8"))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("warc").load(dir).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("truncated WARC payload")), e.getMessage)
  }

  test("pruned scan: narrow projection returns only requested columns") {
    val dir = tmpDir()
    sampleDf.coalesce(1).write.format("warc").mode("append").save(dir)
    val got = spark.read.format("warc").load(dir)
      .select($"target_uri", $"content_length")
      .orderBy($"target_uri".asc_nulls_first)
      .as[(String, Long)].collect()
    assert(got.length == 3 && got(1)._1 == "http://a.example/p1")
  }
}

package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(name).toString

  test("streaming hourlyAgg on bounded input equals the batch aggregate") {
    val inDir = tmp("evt-in")
    // stage the sf0.001 events file as the stream source
    val src = new java.io.File(sf() + "/events.parquet")
    Files.copy(src.toPath, new java.io.File(inDir, "events.parquet").toPath)

    val q = EventStream.hourlyAgg(EventStream.readStream(spark, inDir))
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("hourly_out")
      .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour", "event_type").collect()
    val batch = Tables.events(spark, sf())
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy("hour", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("sessionize: event-time timeout closes sessions across micro-batches") {
    val inDir = tmp("sess-in")
    val base = 1704067200000000L // 2024-01-01T00:00:00Z in micros

    def writeBatch(file: String, rows: Seq[(Long, Long)]): Unit =
      rows.toDF("user_id", "us")
        .select(col("user_id").as("uid"), col("us"))
        .select(lit(1L).as("event_id"), (col("us") * 1000).as("ts"),
          col("uid").as("user_id"), lit("click").as("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(inDir + "/" + file)

    // batch 0: user 7 has two events 1 min apart; batch 1 (staged after
    // the first trigger via maxFilesPerTrigger=1): an event 3 h later
    // advances the watermark past the session timeout
    writeBatch("b0", Seq((7L, base), (7L, base + 60L * 1000000)))
    writeBatch("b1", Seq((7L, base + 3L * 3600 * 1000000)))

    val sessions = EventStream.sessionize(
      EventStream.readStream(spark, inDir + "/*"), gapMinutes = 30)
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sess_out")
      .select("user_id", "start_us", "end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got.contains((7L, base, base + 60L * 1000000, 2L)), s"got=$got")
  }

  test("hourlyAgg append mode drops late data behind the watermark") {
    val inDir = tmp("late-in")
    val base = 1704067200000000L // 2024-01-01T00:00:00Z micros

    def writeBatch(file: String, rows: Seq[Long]): Unit =
      rows.toDF("us")
        .select(lit(1L).as("event_id"), (col("us") * 1000).as("ts"),
          lit(1L).as("user_id"), lit("click").as("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(inDir + "/" + file)

    // batch 0: one event in hour H0, one 5 h later (watermark → T0+3h).
    // batch 1: a late H0 event in the same batch as H0's eviction —
    // Spark admits it (late-drop is best-effort pre-close). batch 2:
    // a late H0 event AFTER the window closed — the append guarantee:
    // no duplicate emission, no resurrected window.
    writeBatch("b0", Seq(base, base + 5L * 3600 * 1000000))
    Thread.sleep(1100)
    writeBatch("b1", Seq(base + 30L * 60 * 1000000))
    Thread.sleep(1100)
    writeBatch("b2", Seq(base + 31L * 60 * 1000000))

    val q = EventStream.hourlyAgg(EventStream.readStream(spark, inDir + "/*"))
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val h0 = spark.table("late_out")
      .filter(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss") === "2024-01-01 00:00:00")
      .select("n").as[Long].collect()
    assert(h0.length == 1, s"H0 must be emitted exactly once, got: ${h0.toSeq}")
    assert(h0.head <= 2L, s"post-close late event leaked into H0: ${h0.toSeq}")
  }

  test("streaming sessionize equals batch sessionization for closed sessions") {
    val inDir = tmp("sess-eq")
    val src = new java.io.File(sf() + "/events.parquet")
    Files.copy(src.toPath, new java.io.File(inDir, "events.parquet").toPath)

    val q = EventStream.sessionize(
      EventStream.readStream(spark, inDir), gapMinutes = 30,
      watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sess_eq_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_eq_out")
      .select("user_id", "start_us", "end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet

    // batch twin: lag-gap sessionization, keeping only sessions the
    // stream could have closed (timeout passed by the final watermark)
    import org.apache.spark.sql.expressions.Window
    val ev = graft.sources.Tables.events(spark, sf())
    val maxUs = ev.agg(max(unix_micros(col("ts")))).as[Long].head()
    val watermark = maxUs - 10L * 60 * 1000000
    val gapUs = 30L * 60 * 1000000
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batch = ev
      .withColumn("gap", unix_micros(col("ts")) -
        unix_micros(lag(col("ts"), 1).over(byUser)))
      .withColumn("new_s", when(col("gap").isNull || col("gap") > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        count(lit(1)).as("n_events"))
      .filter(col("end_us") + gapUs < watermark)
      .select("user_id", "start_us", "end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet

    assert(batch.nonEmpty)
    assert(batch.subsetOf(streamed),
      s"batch-closed sessions missing from stream: ${batch.diff(streamed).take(3)}")
    // streamed may additionally contain sessions whose timeout fired in
    // the final batch; every streamed session must match batch sessions
    // ignoring the closed-filter
    val batchAll = ev
      .withColumn("gap", unix_micros(col("ts")) -
        unix_micros(lag(col("ts"), 1).over(byUser)))
      .withColumn("new_s", when(col("gap").isNull || col("gap") > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        count(lit(1)).as("n_events"))
      .select("user_id", "start_us", "end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed.subsetOf(batchAll),
      s"stream emitted sessions batch never saw: ${streamed.diff(batchAll).take(3)}")
  }

  test("microBatchParquetSink appends batches (K2 shape)") {
    val inDir = tmp("mb-in")
    val outDir = tmp("mb-out") + "/data"
    val ckDir = tmp("mb-ck")
    val src = new java.io.File(sf() + "/events.parquet")
    Files.copy(src.toPath, new java.io.File(inDir, "events.parquet").toPath)

    val q = EventStream.microBatchParquetSink(
      EventStream.readStream(spark, inDir).select("event_id", "event_type"),
      outDir, ckDir).start()
    q.processAllAvailable()
    q.stop()

    assert(spark.read.parquet(outDir).count() ==
      Tables.events(spark, sf()).count())
  }
  test("dedupExactStream: first-wins across micro-batches, state bounded by watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    def t(min: Int) = new java.sql.Timestamp(3600000L + min * 60000L)
    val deduped = EventStream.dedupExactStream(
      in.toDF().toDF("doc_id", "ts", "text").withWatermark("ts", "10 minutes"),
      "text")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    // batch 1: two distinct docs + one duplicate of the first
    in.addData((1L, t(0), "alpha"), (2L, t(1), "beta"), (3L, t(2), "alpha"))
    q.processAllAvailable()
    // batch 2: duplicate arriving within the watermark is still dropped
    in.addData((4L, t(3), "beta"), (5L, t(4), "gamma"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_out").select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "alpha"), (2L, "beta"), (5L, "gamma")))
  }

  test("nearDupStream: stream equals batch minhashLshPairs across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    def t(min: Int) = new java.sql.Timestamp(3600000L + min * 60000L)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val other = "completely different words here nothing shared with others at all"
    val docs = Seq(
      (1L, t(0), base),
      (2L, t(1), base + " extra"), // near-dup of 1
      (3L, t(2), other),
      (4L, t(3), base),            // exact dup of 1 → pairs with 1 AND 2
      (5L, t(4), other + " okay")) // near-dup of 3
    val stream = EventStream.nearDupStream(
      in.toDF().toDF("doc_id", "ts", "text").withWatermark("ts", "10 minutes"),
      "doc_id", "text", "ts", k = 3, threshold = 0.8,
      bands = 16, rowsPerBand = 2)
    val q = stream.writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    in.addData(docs.take(3): _*)
    q.processAllAvailable()
    in.addData(docs.drop(3): _*) // doc 4 must pair against batch-1 state
    q.processAllAvailable()
    q.stop()
    // a pair colliding in several bands is emitted per bucket (the
    // batch op's .distinct() lives downstream) → compare as sets
    val streamed = spark.table("neardup_out")
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    val batch = graft.operators.Dedup.minhashLshPairs(
        docs.toDF("doc_id", "ts", "text"), "doc_id", "text",
        k = 3, threshold = 0.8, bands = 16, rowsPerBand = 2)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty && batch.map(p => (p._1, p._2)) ==
      Set((1L, 2L), (1L, 4L), (2L, 4L), (3L, 5L)))
    assert(streamed == batch,
      s"stream=${streamed.toSeq.sorted} batch=${batch.toSeq.sorted}")
  }

  test("nearDupStream maxBucketSize: hot bucket bounds its state at the " +
      "cap; neardup_bucket_cap metric fires IFF output may be incomplete") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(min: Int) = new java.sql.Timestamp(3600000L + min * 60000L)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    // ten exact duplicates: one hot bucket per band, C(10,2)=45 true pairs
    val docs = (1 to 10).map(i => (i.toLong, t(i), base))
    def run(cap: Int, name: String): (Set[(Long, Long)], Long) = {
      val in = MemoryStream[(Long, java.sql.Timestamp, String)]
      val q = EventStream.nearDupStream(
          in.toDF().toDF("doc_id", "ts", "text")
            .withWatermark("ts", "10 minutes"),
          "doc_id", "text", "ts", k = 3, threshold = 0.8,
          bands = 16, rowsPerBand = 2, maxBucketSize = cap)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      in.addData(docs.take(5): _*); q.processAllAvailable()
      in.addData(docs.drop(5): _*); q.processAllAvailable()
      q.stop()
      val dropped = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("neardup_bucket_cap")))
        .map(_.getAs[Long]("dropped_docs")).sum
      (spark.table(name).select(col("id_a"), col("id_b"))
        .as[(Long, Long)].collect().toSet, dropped)
    }
    val allPairs = (for (a <- 1 to 10; b <- a + 1 to 10)
      yield (a.toLong, b.toLong)).toSet
    // uncapped: every pair found, metric silent
    val (fullPairs, fullDrops) = run(0, "ndcap_off")
    assert(fullPairs == allPairs && fullDrops == 0L,
      s"pairs=${fullPairs.size} drops=$fullDrops")
    // cap 3: residents pair in full; post-cap docs pair only with the
    // 3 residents (verify-not-retain) — pairs among docs 4..10 lost,
    // metric counts every non-retained arrival (7 docs x 16 bands)
    val (capPairs, capDrops) = run(3, "ndcap_on")
    val wantCap = (for (a <- 1 to 3; b <- a + 1 to 10)
      yield (a.toLong, b.toLong)).toSet
    assert(capPairs == wantCap,
      s"missing=${wantCap -- capPairs} extra=${capPairs -- wantCap}")
    assert(capDrops == 7L * 16L, s"drops=$capDrops")
    // the contract: metric fired exactly when recall was lost
    assert((capPairs != allPairs) == (capDrops > 0))
  }

  test("nearMirrorPairsStream + nearMirrorRollupStream: two-hop live " +
      "mirror alarm == batch pair rollup; same-host pairs filtered; " +
      "band collisions dedup in the rollup") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-nearmirror-").toString
    def t(min: Int) = new java.sql.Timestamp(3600000L + min * 60000L)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    // a.com pages 1-5 and b.com pages 11-15 are near-dups of each
    // other (and of their same-host siblings — those must NOT appear
    // cross-host); c.com is unique; zz1/zz2 are the far-future
    // watermark sentinel that closes the base window in hop 2
    val pages = (1 to 5).map(i => (i.toLong, "a.com", t(i - 1), s"$base p$i")) ++
      (11 to 15).map(i => (i.toLong, "b.com", t(i - 11), s"$base p${i - 10} x")) ++
      Seq((21L, "c.com", t(2), "totally unrelated content nothing shared here at all folks")) ++
      Seq((31L, "zz1", t(180), "sentinel mirror text closing the watermark window now"),
        (32L, "zz2", t(181), "sentinel mirror text closing the watermark window now"))
    val in = MemoryStream[(Long, String, java.sql.Timestamp, String)]
    val hop1 = EventStream.nearMirrorPairsStream(
        in.toDF().toDF("doc_id", "host", "ts", "text")
          .withWatermark("ts", "10 minutes"),
        "host", "doc_id", "text", "ts", k = 3, threshold = 0.8,
        bands = 16, rowsPerBand = 2)
      .writeStream.format("parquet").option("path", s"$dir/pairs")
      .option("checkpointLocation", s"$dir/ckpt1")
      .outputMode("append").start()
    in.addData(pages.take(7): _*); hop1.processAllAvailable()
    in.addData(pages.drop(7): _*); hop1.processAllAvailable()
    hop1.stop()
    val pairSchema = spark.read.parquet(s"$dir/pairs").schema
    val hop2 = EventStream.nearMirrorRollupStream(
        spark.readStream.schema(pairSchema).parquet(s"$dir/pairs"),
        windowSize = "10 minutes", watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("mirror_rollup")
      .outputMode("append").start()
    hop2.processAllAvailable(); hop2.stop()
    val got = spark.table("mirror_rollup")
      .select($"host_a", $"host_b", $"matched_pairs",
        round($"max_jaccard", 6).as("mj"))
      .as[(String, String, Long, Double)].collect().toSet
    // batch twin: the SAME pair stage (minhashLshPairs) + host
    // attribution + distinct cross-host rollup — the closed base
    // window must hold exactly this
    val pgDf = pages.toDF("doc_id", "host", "ts", "text")
    val hosts = pgDf.select($"doc_id", $"host")
    val batch = graft.operators.Dedup.minhashLshPairs(
        pgDf.filter($"host".isin("a.com", "b.com", "c.com")),
        "doc_id", "text", k = 3, threshold = 0.8,
        bands = 16, rowsPerBand = 2)
      .join(hosts.toDF("id_a", "ha"), Seq("id_a"))
      .join(hosts.toDF("id_b", "hb"), Seq("id_b"))
      .filter($"ha" =!= $"hb")
      .select(least($"ha", $"hb").as("host_a"),
        greatest($"ha", $"hb").as("host_b"), $"jaccard")
      .groupBy($"host_a", $"host_b")
      .agg(count(lit(1)).as("matched_pairs"),
        round(max($"jaccard"), 6).as("mj"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(batch.nonEmpty && batch.forall(r =>
      Set(r._1, r._2) == Set("a.com", "b.com")), batch)
    assert(got == batch,
      s"stream=${got.toSeq.sorted} batch=${batch.toSeq.sorted}")
    // the sentinel window stays open (nothing after it advances the
    // watermark past it) — its absence above is the append contract
    assert(!got.exists(r => r._1 == "zz1"))
  }

  test("nearDupStream: event-time timeout evicts buckets (state bounded by watermark)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    def t(min: Int) = new java.sql.Timestamp(3600000L + min * 60000L)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val stream = EventStream.nearDupStream(
      in.toDF().toDF("doc_id", "ts", "text").withWatermark("ts", "10 minutes"),
      "doc_id", "text", "ts", k = 3, threshold = 0.8,
      bands = 16, rowsPerBand = 2, stateTtlMinutes = 60)
    val q = stream.writeStream.format("memory").queryName("neardup_ttl_out")
      .outputMode("append").start()
    in.addData((1L, t(0), base)) // seeds the buckets
    q.processAllAvailable()
    // advance the watermark far past bucket-1's timeout (t0 + 60 min)
    // with unrelated docs; the third batch fires the timeouts (no data
    // for doc-1's buckets in it)
    in.addData((100L, t(500), "zz yy xx ww vv uu tt ss rr qq pp oo nn"))
    q.processAllAvailable()
    in.addData((101L, t(501), "aa bb cc dd ee ff gg hh ii jj kk ll mm"))
    q.processAllAvailable()
    // doc 6 is an exact dup of doc 1 — but the bucket state was evicted
    in.addData((6L, t(502), base))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("neardup_ttl_out")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 6L),
      s"evicted bucket resurrected: $pairs")
  }

  test("readStream fails fast on an empty source dir instead of guessing the ts encoding") {
    // a stream's declared schema is fixed for its lifetime — silently
    // assuming INT64 nanos here would divide later-arriving native
    // TIMESTAMP(MICROS) files by 1000 for the whole run
    val empty = tmp("evt-empty")
    val e = intercept[IllegalArgumentException] {
      EventStream.readStream(spark, empty)
    }
    assert(e.getMessage.contains("representative parquet file"), e.getMessage)
  }

  test("readStream rejects a source whose ts column is neither timestamp nor long") {
    val inDir = tmp("evt-badts")
    Seq((1L, "not-a-ts")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(inDir)
    val e = intercept[IllegalArgumentException] {
      EventStream.readStream(spark, inDir)
    }
    assert(e.getMessage.contains("unsupported ts type"), e.getMessage)
  }

  test("heavyHitterCandidatesStream: live candidates are a superset; batch verify is exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 602-token vocabulary vs 4 shards x capacity 13 = 52 counters:
    // every shard runs constant decrement rounds
    val docs = (0L until 200L).map { i =>
      (i, s"hot cold r${3 * i} r${3 * i + 1} r${3 * i + 2}")
    }
    val (shards, capacity) = (4, 13)
    val in = MemoryStream[(Long, String)]
    val stream = EventStream.heavyHitterCandidatesStream(
      in.toDF().toDF("doc_id", "text"), "text", shards, capacity)
    val q = stream.writeStream.format("memory").queryName("hh_out")
      .outputMode("update").start()
    docs.grouped(70).foreach { chunk => in.addData(chunk: _*); q.processAllAvailable() }
    q.stop()
    // latest summary per shard = the row with that shard's max np
    // (np strictly grows on every invocation)
    val rows = spark.table("hh_out")
      .as[(Int, Map[String, Long], Long, Long)].collect()
    val latest = rows.groupBy(_._1).map { case (_, rs) => rs.maxBy(_._3) }
    assert(latest.forall(_._2.size <= capacity)) // state stays bounded
    val nGlobal = latest.map(_._3).sum
    assert(nGlobal == 1000L)
    // monitor-side candidate rule at theta = 1/10
    val candidates = latest.flatMap { case (_, counts, _, dp) =>
      counts.collect { case (t, w) if (w + dp) * 10L >= nGlobal => t }
    }.toSet
    val batchDf = docs.toDF("doc_id", "text")
    val exact = graft.operators.TextAnalysis
      .heavyHitters(batchDf, "text", 1L, 10L, capacity = 13)
      .as[(String, Long, Long)].collect().toSet
    assert(exact.map(_._1) == Set("hot", "cold"))
    assert(exact.map(_._1).subsetOf(candidates), s"candidates=$candidates")
    assert(candidates.size <= shards * capacity)
    // batch verify over the accumulated corpus: exact counts of the
    // live candidates reproduce the batch operator's result
    val verified = batchDf
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok").isin(candidates.toSeq: _*))
      .groupBy(col("tok")).count()
      .filter(col("count") * 10L >= nGlobal)
      .as[(String, Long)].collect().map(t => (t._1, t._2, nGlobal)).toSet
    assert(verified == exact)
  }
}

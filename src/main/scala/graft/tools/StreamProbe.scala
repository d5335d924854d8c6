package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Throughput/state probe for the streaming surface (r14 verdict task
  * 5): the four stateful streaming operators are spec-pinned for
  * CORRECTNESS (stream ≡ batch), but no BASELINE row records what they
  * COST — events/s, per-batch duration, and state-store size are what
  * a streaming deployment is sized by. Each probe runs the operator
  * over a generated file stream to completion and reports the
  * StreamingQueryProgress facts. `runMain graft.tools.StreamProbe
  * <sfDir> <copies>`; 2+ `copies` scales = the BASELINE table.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StreamProbe <sfDir> <copies>")
    val (sfDir, copies) = (args(0), args(1).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{CrawlPipeline, Robots, TextAnalysis}
    import graft.streaming.EventStream

    val base = 1767225600L
    val root = java.nio.file.Files
      .createTempDirectory("graft-streamprobe-").toString
    val docs0 = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val nBase = docs0.count()
    // unique text per copy — identical copies would make every bucket
    // a C-clique and measure the blow-up, not the operator
    val corpus = docs0
      .crossJoin(spark.range(copies).select(col("id").as("__c")))
      .select((col("doc_id") + col("__c") * 10000000L).as("doc_id"),
        concat(col("text"), lit(" c"), col("__c")).as("text"),
        (lit(base) + pmod(col("doc_id") + col("__c"), lit(3600L)))
          .as("epoch"))
    val n = nBase * copies
    println(s"[streamprobe] corpus=$n docs (copies=$copies)")

    def run(name: String, q: StreamingQuery): Unit = {
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      val prog = q.recentProgress
      val rows = prog.map(_.numInputRows).sum
      val maxBatch =
        if (prog.isEmpty) 0L
        else prog.map(p => Option(p.durationMs.get("triggerExecution"))
          .map(_.toLong).getOrElse(0L)).max
      // PEAK state is the sizing number (the final batch often holds
      // only unclosed tails after the watermark flushed everything)
      val state = prog.filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators.map(_.numRowsTotal).sum)
        .foldLeft(0L)(math.max)
      val endState = prog.reverse.find(_.stateOperators.nonEmpty)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      val dropped = prog.toSeq
        .flatMap(p => Option(p.observedMetrics.get("neardup_bucket_cap")))
        .map(_.getAs[Long]("dropped_docs")).sum
      q.stop()
      println(f"[streamprobe] $name%-12s inputRows=$rows%-9d wall=$wall%7.2f s " +
        f"rate=${rows / math.max(wall, 1e-9)}%9.0f ev/s batches=${prog.length}%-3d " +
        f"maxBatch=${maxBatch}%6d ms stateRowsPeak=$state%d end=$endState%d" +
        (if (dropped > 0) f" capDropped=$dropped%d" else ""))
    }

    // ---- near-dup pairs (LSH bucket state) -------------------------
    locally {
      val dir = s"$root/neardup"
      // 10% of docs get an exact twin — the pairs the stream must find
      corpus.unionByName(corpus.filter(pmod(col("doc_id"), lit(10)) === 0)
          .select((col("doc_id") + 5000000000L).as("doc_id"), col("text"),
            (col("epoch") + 60).as("epoch")))
        .repartition(8).write.mode("overwrite").json(dir)
      val in = spark.readStream
        .schema("doc_id LONG, text STRING, epoch LONG")
        .option("maxFilesPerTrigger", 2).json(dir)
        .withColumn("ts", timestamp_seconds(col("epoch")))
        .withWatermark("ts", "10 minutes")
      run("neardup", EventStream.nearDupStream(in, "doc_id", "text", "ts")
        .writeStream.format("noop").outputMode("append").start())
    }

    // ---- stream-stream proximity join (r16) ------------------------
    // withinDistanceEvents with BOTH sides streaming: the join-range
    // time condition is what lets Spark bound each side's buffered
    // state by the watermark. Two watermarks on the SAME corpus (1 h
    // event-time span, arriving unordered): 70 min buffers everything
    // (worst-case state = both inputs), 10 min evicts as the
    // watermark advances — the peak-state DELTA is the eviction
    // claim, measured.
    locally {
      import graft.operators.GeoJoin
      val dirA = s"$root/proxa"; val dirB = s"$root/proxb"
      def evs(seed: Int): DataFrame = spark.range(n).select(
        col("id"),
        (pmod(xxhash64(col("id"), lit(seed)), lit(360000000L)) / 1e6
          - 180).as("lon"),
        (pmod(xxhash64(col("id"), lit(seed + 1)), lit(120000000L)) / 1e6
          - 60).as("lat"),
        (lit(base) + pmod(col("id") * 7 + seed, lit(3600L))).as("epoch"))
      evs(21).repartition(8).write.mode("overwrite").json(dirA)
      evs(23).repartition(8).write.mode("overwrite").json(dirB)
      def rd(dir: String, wm: String): DataFrame = spark.readStream
        .schema("id LONG, lon DOUBLE, lat DOUBLE, epoch LONG")
        .option("maxFilesPerTrigger", 2).json(dir)
        .withColumn("ts", timestamp_seconds(col("epoch")))
        .withWatermark("ts", wm)
      Seq("70 minutes" -> "prox_wmwide", "10 minutes" -> "prox_wm10")
        .foreach { case (wm, name) =>
          run(name, GeoJoin.withinDistanceEvents(rd(dirA, wm), rd(dirB, wm),
              "id", "lon", "lat", "ts", "id", "lon", "lat", "ts",
              radiusM = 5000.0, maxGapSeconds = 300)
            .writeStream.format("noop").outputMode("append").start())
        }
    }

    // ---- near-dup HOT BUCKET: the maxBucketSize cap's reason to
    // exist (r16 verdict task 6). A planted 1000-doc exact clique puts
    // ~1000 docs in ONE bucket per band: uncapped, the within-bucket
    // verify is quadratic (C(1000,2) x 16 bands of emitted pairs and
    // comparisons); capped, each arrival does <= cap comparisons and
    // the capDropped metric reports the recall loss. Compare maxBatch.
    locally {
      val dir = s"$root/neardup_hot"
      // ONE event time for the whole hot corpus: the files batch in
      // hash order, so spread epochs would make most of a later batch
      // LATE (watermark-filtered before the state op — the first cut
      // of this probe measured that, not the bucket quadratic). With a
      // constant epoch nothing is late, the clique accumulates across
      // all batches, and the uncapped within-bucket quadratic actually
      // materializes; expected capDropped at cap 256 = (1000-256)x16
      // bands = 11904 exactly, pinning the metric end to end.
      corpus.select(col("doc_id"), col("text"), lit(base).as("epoch"))
        .unionByName(spark.range(1000).select(
          (col("id") + 8000000000L).as("doc_id"),
          lit("hot boilerplate page identical on every mirror of this " +
            "template again and again").as("text"),
          lit(base).as("epoch")))
        .repartition(8).write.mode("overwrite").json(dir)
      def in = spark.readStream
        .schema("doc_id LONG, text STRING, epoch LONG")
        .option("maxFilesPerTrigger", 2).json(dir)
        .withColumn("ts", timestamp_seconds(col("epoch")))
        .withWatermark("ts", "10 minutes")
      run("ndhot_nocap", EventStream
        .nearDupStream(in, "doc_id", "text", "ts", maxBucketSize = 0)
        .writeStream.format("noop").outputMode("append").start())
      run("ndhot_cap256", EventStream
        .nearDupStream(in, "doc_id", "text", "ts", maxBucketSize = 256)
        .writeStream.format("noop").outputMode("append").start())
    }

    // ---- postings churn (per-doc term-set state) -------------------
    locally {
      val dir = s"$root/churn"
      corpus.unionByName(corpus.filter(pmod(col("doc_id"), lit(5)) === 0)
          .select(col("doc_id"),
            concat(regexp_replace(col("text"), "^[^ ]+ ", ""),
              lit(" updated")).as("text"),
            (col("epoch") + 3600).as("epoch")))
        .repartition(8).write.mode("overwrite").json(dir)
      val in = spark.readStream
        .schema("doc_id LONG, text STRING, epoch LONG")
        .option("maxFilesPerTrigger", 2).json(dir)
        .withColumn("ts", timestamp_seconds(col("epoch")))
        .withWatermark("ts", "10 minutes")
      run("churn", TextAnalysis.postingsChurnStateful(in, "doc_id", "text", "ts")
        .writeStream.format("noop").outputMode("append").start())
    }

    // ---- polite gate (per-(host, minute) windowed state) -----------
    locally {
      import spark.implicits._
      val dir = s"$root/warc"
      corpus.select(
          concat(lit("<urn:sp:"), col("doc_id"), lit(">")).as("record_id"),
          lit("response").as("record_type"),
          concat(lit("http://h"), pmod(col("doc_id"), lit(50)).cast("string"),
            lit(".ex/p/"), col("doc_id")).as("target_uri"),
          date_format(timestamp_seconds(col("epoch")),
            "yyyy-MM-dd'T'HH:mm:ss'Z'").as("warc_date"),
          lit("text/html").as("content_type"),
          encode(concat(lit("<html><head><title>t</title></head><body><p>"),
            col("text"), lit("</p></body></html>")), "UTF-8").as("payload"))
        .repartition(8).write.format("warc").mode("append")
        .option("compression", "gzip").save(dir)
      val rules = Seq.empty[(String, String, Boolean)]
        .toDF("host", "prefix", "allow")
      val delays = Robots.parseCrawlDelay(
        (0 until 10).map(i => (s"h$i.ex", "User-agent: *\nCrawl-delay: 2"))
          .toDF("host", "text"), "host", "text", "*")
      val (sDocs, _) = CrawlPipeline.fromWarcStreamPolite(
        spark.readStream.format("warc").load(dir), rules, delays)
      run("politegate", sDocs.writeStream.format("noop")
        .outputMode("append").start())
    }

    // ---- sessionize: native session_window vs flatMapGroupsWithState
    // (the ROADMAP item-7 comparison: same gap semantics, measure the
    // state-store footprints) ----------------------------------------
    locally {
      val dir = s"$root/events"
      val nEv = n * 4
      val users = 5000L
      // event k of a user: 5-min cadence, a 2-hour hole every 8 events
      // closes a session; one far-future sentinel advances the
      // watermark so every session closes inside the probe
      spark.range(nEv).select(
          pmod(col("id"), lit(users)).as("user_id"),
          timestamp_seconds(lit(base) +
            expr(s"id div $users") * 300 +
            expr(s"(id div $users) div 8") * 7200).as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(dir)
      spark.range(1).select(lit(-1L).as("user_id"),
          timestamp_seconds(lit(base) + 100000000L).as("ts"))
        .coalesce(1).write.mode("append").parquet(dir)
      def in = spark.readStream.schema("user_id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 2).parquet(dir)
      val nat = in.withWatermark("ts", "10 minutes")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
      run("sess_native", nat.writeStream.format("noop")
        .outputMode("append").start())
      run("sess_fmgws", graft.streaming.EventStream
        .sessionize(in, gapMinutes = 30)
        .writeStream.format("noop").outputMode("append").start())
    }

    // ---- heavy hitters (bounded Misra-Gries shard state) -----------
    locally {
      val in = spark.readStream
        .schema("doc_id LONG, text STRING, epoch LONG")
        .option("maxFilesPerTrigger", 2).json(s"$root/neardup")
      run("heavyhitter", EventStream.heavyHitterCandidatesStream(in, "text")
        .writeStream.format("noop").outputMode("update").start())
    }

    spark.stop()
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.9): the reference is a
  * bounded one-pass push stream with sink-side micro-batching
  * (filter.py:192-211); its Spark-native generalization is
  * `readStream → transform → writeStream`:
  *   - [[hourlyAgg]] — event-time tumbling-window aggregation with a
  *     watermark (shares semantics with the batch `events_hourly`
  *     query: same groupBy, same results on bounded input);
  *   - [[sessionize]] — keyed custom state via flatMapGroupsWithState
  *     (event-time timeout = the 30-min session gap), the streaming
  *     twin of the batch `events_sessionize` lag/running-sum query;
  *   - [[microBatchParquetSink]] — foreachBatch append, the K2
  *     micro-batch-flush shape (WRITE_AFTER, settings_default.py:50)
  *     with Spark managing batch boundaries and exactly-once bookkeeping.
  */
object EventStream {

  /** Events schema for streaming reads when `ts` arrives as raw INT64
    * nanos (the TIMESTAMP(NANOS) testdata generation and the spec
    * fixtures — see [[graft.sources.Tables.readEvents]]).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming reads must declare a schema up front, so sniff the
    * on-disk `ts` encoding with ONE batch footer read of the same path
    * (setup-time only — no per-batch cost), then declare the matching
    * stream schema; both encodings resolve to session-tz TimestampType,
    * mirroring [[graft.sources.Tables.readEvents]].
    *
    * The path must already contain at least one representative events
    * file: a stream's declared schema is fixed for its lifetime, so
    * sniff-failure (empty dir, unreadable files, no `ts` column) FAILS
    * FAST instead of guessing. The round-12 behavior — silently
    * assuming INT64 nanos — meant native TIMESTAMP(MICROS) files
    * landing later were floor-divided by 1000, compressing the
    * timeline 1000× with no error anywhere.
    */
  def readStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    val onDisk = scala.util.Try(spark.read.parquet(dir).schema) match {
      case scala.util.Success(s) if s.fieldNames.contains("ts") => s
      case scala.util.Success(s) =>
        throw new IllegalArgumentException(
          s"events stream at $dir has no 'ts' column (schema: ${s.simpleString}); " +
            "cannot declare a stream schema")
      case scala.util.Failure(e) =>
        throw new IllegalArgumentException(
          s"cannot sniff the events 'ts' encoding at $dir — the stream's " +
            "schema is fixed at start, so the path must contain at least one " +
            "representative parquet file before readStream is called", e)
    }
    onDisk("ts").dataType match {
      case TimestampType | TimestampNTZType =>
        spark.readStream
          .schema(onDisk)
          .option("maxFilesPerTrigger", maxFilesPerTrigger)
          .parquet(dir)
          .withColumn("ts", col("ts").cast(TimestampType))
      case LongType =>
        spark.readStream
          .schema(rawSchema)
          .option("maxFilesPerTrigger", maxFilesPerTrigger)
          .parquet(dir)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other =>
        throw new IllegalArgumentException(
          s"events stream at $dir has unsupported ts type $other " +
            "(expected TIMESTAMP or INT64 nanos)")
    }
  }

  /** Tumbling 1-hour event-time windows, 2-hour watermark. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  /** Carries the watermarked `ts` column through groupByKey — the
    * unsupported-operation checker requires the event-time attribute to
    * survive into the flatMapGroupsWithState child.
    */
  case class SessionEvent(user_id: Long, ts_us: Long, ts: java.sql.Timestamp)
  case class SessionBuf(start_us: Long, last_us: Long, n: Long)
  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** Keyed sessionization with a gap timeout: events within
    * `gapMinutes` of the previous event extend the session; a closed
    * session is emitted when the event-time watermark passes
    * last + gap. State is one small buffer per open session — O(active
    * users), spilling and fault tolerance handled by the state store.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000

    def update(userId: Long, rows: Iterator[SessionEvent],
        state: GroupState[SessionBuf]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val b = state.get
        state.remove()
        Iterator.single(Session(userId, b.start_us, b.last_us, b.n))
      } else {
        val sorted = rows.map(_.ts_us).toArray.sorted
        var out = List.empty[Session]
        var buf = state.getOption.orNull
        sorted.foreach { t =>
          if (buf == null) buf = SessionBuf(t, t, 1)
          else if (t - buf.last_us > gapUs) {
            out = Session(userId, buf.start_us, buf.last_us, buf.n) :: out
            buf = SessionBuf(t, t, 1)
          } else buf = SessionBuf(buf.start_us, math.max(buf.last_us, t), buf.n + 1)
        }
        if (buf != null) {
          state.update(buf)
          state.setTimeoutTimestamp((buf.last_us + gapUs) / 1000) // ms
        }
        out.reverseIterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("ts"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** K2 — micro-batch parquet append via foreachBatch. */
  def microBatchParquetSink(df: DataFrame, path: String, checkpoint: String) =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(path)
      }

  /** Streaming exact dedup — the ingestion-side twin of
    * [[graft.operators.Dedup.exactCanonical]]: keep the FIRST document
    * per content hash across micro-batches. State is one 16-byte hash
    * per distinct document, bounded by the event-time watermark
    * (`dropDuplicatesWithinWatermark` evicts hashes once no duplicate
    * can still arrive — the unbounded-state trap of plain
    * dropDuplicates on an infinite stream). Rows must carry an
    * event-time column already watermarked by the caller.
    */
  def dedupExactStream(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("__h", md5(col(textCol)))
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")

  /** One LSH bucket row: a doc's (band, band-hash) key plus what the
    * verify step needs (shingle set + event time for state eviction).
    * `host` rides along for [[nearMirrorPairsStream]]'s cross-host
    * attribution ([[nearDupStream]] passes an empty literal — the
    * column is constant-folded and costs nothing there).
    */
  case class BucketRow(band: Int, bh: Long, id: Long, host: String,
      ts_us: Long, sh: Seq[String], ts: java.sql.Timestamp)
  // state entries: (id, ts_us, host, shingles)
  case class BucketState(docs: List[(Long, Long, String, Seq[String])])
  case class NearDupPair(id_a: Long, id_b: Long, jaccard: Double)

  /** Internal emit row for the LSH bucket feed: a pair OR a cap-drop
    * marker (`dropped = 1`, pair fields sentinel) — the marker rides
    * the output through `observe()` (the jaccard_skew_cap discipline:
    * the loss is a metric on the normal pass, not a side channel) and
    * is filtered before the public output. (id_a, host_a) is the
    * smaller-id doc's side; ts_us is the LATER doc's event time (the
    * arrival that completed the pair — the pair's own event time for
    * downstream windowing).
    */
  case class NearDupEmit(ts_us: Long, id_a: Long, host_a: String,
      id_b: Long, host_b: String, jaccard: Double, dropped: Long)

  /** Streaming MinHash-LSH near-dup pairs — the FUZZY twin of
    * [[dedupExactStream]] and the streaming form of
    * [[graft.operators.Dedup.minhashLshPairs]]: same sketch (shingle
    * set → MinHash signature → banded keys, all computed STATELESSLY
    * per row by the batch kernels), then a keyed state store per LSH
    * bucket replaces the batch band self-join. A new doc verifies
    * exact Jaccard against the docs already in its bucket (and earlier
    * same-batch arrivals, processed in deterministic (ts, id) order)
    * and joins the bucket's state; the event-time timeout evicts a
    * bucket once the watermark passes its newest doc + `stateTtl` — so
    * state is bounded by the watermark horizon exactly like
    * `dropDuplicatesWithinWatermark`, never corpus-proportional.
    *
    * Output may repeat a pair that collides in several bands (the
    * batch operator's `.distinct()` — downstream dedups; within one
    * bucket a pair is emitted once). A pair is found iff both docs
    * arrive within `stateTtl` of each other — the watermark-bounded
    * contract, same recall-vs-state trade every streaming dedup makes.
    *
    * `maxBucketSize` bounds the per-bucket VERIFY (round 16 — the
    * quadratic-within-bucket hazard the batch twin caps with
    * `maxKeyDf`; the stream relied on stateTtl sizing alone, and the
    * r15 throughput table's 16 s maxBatch at 250k docs was exactly a
    * hot bucket's within-batch quadratic): once a bucket holds
    * `maxBucketSize` docs, later arrivals still verify against the
    * residents (each arrival costs ≤ cap comparisons) but are NOT
    * retained — two post-cap docs can no longer pair through this
    * bucket (they may still meet in another band). Every non-retained
    * doc increments the `neardup_bucket_cap.dropped_docs` observed
    * metric (read it off `StreamingQueryProgress.observedMetrics`),
    * which is > 0 IFF output may be incomplete — the
    * jaccard_skew_cap discipline. `maxBucketSize = 0` disables the
    * cap (pre-r16 behavior). With the cap, per-bucket state is
    * O(maxBucketSize) and a micro-batch's bucket cost is
    * O(arrivals · cap) instead of O(arrivals²).
    *
    * `docs` must already carry the watermarked event-time column
    * `tsCol` (same contract as [[dedupExactStream]]).
    */
  def nearDupStream(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, k: Int = 3, threshold: Double = 0.8,
      bands: Int = 16, rowsPerBand: Int = 2,
      stateTtlMinutes: Int = 60,
      maxBucketSize: Int = 1024): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    lshBucketFeed(docs, idCol, lit(""), textCol, tsCol, k, threshold,
        bands, rowsPerBand, stateTtlMinutes, maxBucketSize)
      .toDF()
      // the loss metric rides the output relation (CollectMetrics —
      // visible per micro-batch in observedMetrics), then the markers
      // filter out of the public pair stream
      .observe("neardup_bucket_cap", sum(col("dropped")).as("dropped_docs"))
      .filter(col("dropped") === 0L)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .as[NearDupPair]
  }

  /** The shared LSH bucket machinery of [[nearDupStream]] and
    * [[nearMirrorPairsStream]]: shingle → MinHash → banded keys
    * stateless per row, keyed state per (band, band-hash) bucket,
    * exact Jaccard verify against residents, `maxBucketSize` cap with
    * drop markers. See [[nearDupStream]] for the full contract.
    */
  private def lshBucketFeed(docs: DataFrame, idCol: String,
      hostExpr: org.apache.spark.sql.Column, textCol: String,
      tsCol: String, k: Int, threshold: Double,
      bands: Int, rowsPerBand: Int, stateTtlMinutes: Int,
      maxBucketSize: Int): Dataset[NearDupEmit] = {
    import docs.sparkSession.implicits._
    import graft.functions.{Sketches, TextFunctions}
    val ttlMs = stateTtlMinutes.toLong * 60 * 1000

    def jaccard(a: Seq[String], b: Seq[String]): Double = {
      val sa = a.toSet
      var inter = 0
      b.foreach(x => if (sa.contains(x)) inter += 1)
      val union = sa.size + b.size - inter
      if (union == 0) 0.0 else inter.toDouble / union
    }

    def update(key: (Int, Long), rows: Iterator[BucketRow],
        state: GroupState[BucketState]): Iterator[NearDupEmit] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val arrived = rows.toArray.sortBy(r => (r.ts_us, r.id))
        var known = state.getOption.map(_.docs).getOrElse(Nil)
        val out = List.newBuilder[NearDupEmit]
        arrived.foreach { r =>
          if (!known.exists(_._1 == r.id)) { // re-delivery is a no-op
            known.foreach { case (oid, ots, ohost, osh) =>
              val j = jaccard(r.sh, osh)
              if (j >= threshold) {
                val (ia, ha, ib, hb) =
                  if (r.id < oid) (r.id, r.host, oid, ohost)
                  else (oid, ohost, r.id, r.host)
                out += NearDupEmit(math.max(r.ts_us, ots), ia, ha, ib, hb,
                  j, 0L)
              }
            }
            if (maxBucketSize <= 0 || known.size < maxBucketSize)
              known = (r.id, r.ts_us, r.host, r.sh) :: known
            else // verified above but NOT retained: recall may be lost
              out += NearDupEmit(-1L, -1L, "", -1L, "", -1.0, 1L)
          }
        }
        state.update(BucketState(known))
        val newest = known.map(_._2).max
        // timeout must sit strictly past the current watermark (Spark
        // rejects a timestamp the watermark already passed — possible
        // when only late-but-admitted rows extend an old bucket)
        state.setTimeoutTimestamp(
          math.max(newest / 1000 + ttlMs, state.getCurrentWatermarkMs() + 1))
        out.result().iterator
      }
    }

    docs
      .select(col(idCol).as("id"), hostExpr.cast("string").as("host"),
        unix_micros(col(tsCol)).as("ts_us"),
        TextFunctions.shingleSet(col(textCol), k).as("sh"), col(tsCol).as("ts"))
      .withColumn("sig", Sketches.minhash(col("sh"), bands * rowsPerBand))
      .select(posexplode(transform(sequence(lit(0), lit(bands - 1)),
          bi => hash(slice(col("sig"), bi * rowsPerBand + 1, lit(rowsPerBand)))))
          .as(Seq("band", "bh")),
        col("id"), col("host"), col("ts_us"), col("sh"), col("ts"))
      .as[BucketRow]
      .groupByKey(r => (r.band, r.bh))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming NEAR-MIRROR pair feed — the live twin of
    * [[graft.operators.CrawlPipeline.nearMirrorHosts]]' pair stage
    * (the round-15 record's last open streaming candidate): the
    * [[nearDupStream]] machinery with each page's HOST riding the
    * bucket state, emitting only CROSS-host near-dup pairs — the raw
    * "two hosts are serving the same content" signal, per fetch, as
    * it happens. Output columns: (ts, host_a, host_b, id_a, id_b,
    * jaccard) with host_a < host_b lexically and id_a the page ON
    * host_a; ts is the completing arrival's event time (the pair's
    * event time for downstream windowing). Same contracts as
    * [[nearDupStream]]: caller watermarks `tsCol`; pairs may repeat
    * across bands (dedup downstream — [[nearMirrorRollupStream]]
    * does); `maxBucketSize` bounds the per-bucket verify with the
    * `nearmirror_bucket_cap.dropped_docs` loss metric, > 0 iff
    * output may be incomplete. Same-host near-dups (ordinary
    * within-site boilerplate) drop AFTER the cap accounting — a
    * boilerplate clique still costs its verifies, which is what the
    * cap is for.
    */
  def nearMirrorPairsStream(docs: DataFrame, hostCol: String,
      idCol: String, textCol: String, tsCol: String,
      k: Int = 3, threshold: Double = 0.8,
      bands: Int = 16, rowsPerBand: Int = 2,
      stateTtlMinutes: Int = 60, maxBucketSize: Int = 1024): DataFrame =
    lshBucketFeed(docs, idCol, col(hostCol), textCol, tsCol, k, threshold,
        bands, rowsPerBand, stateTtlMinutes, maxBucketSize)
      .toDF()
      .observe("nearmirror_bucket_cap",
        sum(col("dropped")).as("dropped_docs"))
      .filter(col("dropped") === 0L && col("host_a") =!= col("host_b"))
      .select(timestamp_micros(col("ts_us")).as("ts"),
        least(col("host_a"), col("host_b")).as("h1"),
        greatest(col("host_a"), col("host_b")).as("h2"),
        when(col("host_a") <= col("host_b"), col("id_a"))
          .otherwise(col("id_b")).as("p1"),
        when(col("host_a") <= col("host_b"), col("id_b"))
          .otherwise(col("id_a")).as("p2"),
        col("jaccard"))
      .withColumnsRenamed(Map("h1" -> "host_a", "h2" -> "host_b",
        "p1" -> "id_a", "p2" -> "id_b"))

  /** The WINDOWED rollup over [[nearMirrorPairsStream]]'s feed: per
    * event-time window and host pair, the distinct near-dup pair
    * count and max similarity — the live mirror ALARM. Runs as the
    * SECOND hop of the repo's two-hop pattern (pair feed → file sink
    * → this query): `pairs` is a fresh stream over the pair files, so
    * this query owns its watermark and its two stateful operators
    * (band-collision dedup, then the windowed aggregate) chain in
    * append mode without touching the fmgws query. The batch scorer
    * ([[graft.operators.CrawlPipeline.nearMirrorHosts]]) remains the
    * ranked-score authority — its matched_a/matched_b are DISTINCT
    * PAGE counts per side, which a streaming aggregate cannot hold
    * exactly; the rollup's pair count is the alarm that triggers it.
    * Output: (window_start, window_end, host_a, host_b,
    * matched_pairs, max_jaccard).
    */
  def nearMirrorRollupStream(pairs: DataFrame, windowSize: String,
      watermarkDelay: String): DataFrame =
    pairs
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("host_a", "host_b", "id_a", "id_b")
      .groupBy(window(col("ts"), windowSize).as("w"),
        col("host_a"), col("host_b"))
      .agg(count(lit(1)).as("matched_pairs"),
        max(col("jaccard")).as("max_jaccard"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("host_a"), col("host_b"),
        col("matched_pairs"), col("max_jaccard"))

  /** Streaming point-in-time enrichment — the stream-static twin of
    * [[graft.operators.AsofJoin]]: attach to each event the latest
    * static snapshot at-or-before its time. Instead of a streaming
    * aggregation (which would force update mode + state), the STATIC
    * side is rewritten batch-side into SCD-2 validity intervals
    * (valid_from = snapshot time, valid_to = next snapshot's time via
    * lead()), so each event equi-matches exactly one snapshot row under
    * a stateless stream-static join — append mode, zero streaming
    * state, watermark-free. The interval rewrite is one keyed window
    * over the (small, static) snapshot table, re-planned per
    * micro-batch by Spark as usual for stream-static joins.
    *
    * @param events    streaming side; must carry `key` and `eventTime`
    * @param snapshots static side with `key`, `snapTime`, `payload` cols
    * @param inner     false keeps events before any snapshot (null payload)
    */
  def enrichAsof(events: DataFrame, snapshots: DataFrame, key: String,
      eventTime: String, snapTime: String, payload: Seq[String],
      inner: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__k")).orderBy(col("__from"))
    val iv = snapshots.select(
      (col(key).as("__k") +: col(snapTime).as("__from") +: payload.map(col)): _*)
      .withColumn("__to", lead(col("__from"), 1).over(w))
    val joined = events.join(iv,
      events(key) === iv("__k") && events(eventTime) >= iv("__from") &&
        (iv("__to").isNull || events(eventTime) < iv("__to")),
      if (inner) "inner" else "left")
    joined.select(events.columns.map(events(_)).toSeq ++
      payload.map(iv(_)) :+ iv("__from").as("snap_time"): _*)
  }

  /** One shard's live Misra–Gries summary: the bounded counter map plus
    * the shard's exact token count and decrement-round count.
    */
  case class MgSummary(shard: Int, counts: Map[String, Long], np: Long,
      dp: Long)

  /** Streaming heavy-hitter candidate maintenance — the streaming twin
    * of [[graft.operators.TextAnalysis.heavyHitters]]'s candidate pass.
    * Tokens hash-route to `shards` keyed state groups; each group keeps
    * ONE resumable [[graft.operators.TextAnalysis.MisraGries]] summary
    * (restored from state, advanced by the micro-batch, emitted in
    * Update mode each trigger). Because a token lives in exactly one
    * shard, its undercount is bounded by that shard's OWN deficit, so
    * the monitor-side candidate rule
    * `(w + dp_shard) * thetaDen >= N_global * thetaNum`
    * (N_global = sum of the latest np over shards) yields a guaranteed
    * superset of the true heavy hitters at every trigger — the same
    * prune-never-decide contract as the batch operator, with state
    * bounded at `shards * capacity` counters FOREVER (no watermark
    * needed: boundedness is the sketch's own property, not an eviction
    * policy). Exact counts come from the batch verify over the sink —
    * the standard sketch-live / verify-batch split.
    */
  def heavyHitterCandidatesStream(docs: DataFrame, textCol: String,
      shards: Int = 32, capacity: Int = 1024): Dataset[MgSummary] = {
    import docs.sparkSession.implicits._
    def update(shard: Int, rows: Iterator[(Int, String)],
        state: GroupState[MgSummary]): Iterator[MgSummary] = {
      val mg = new graft.operators.TextAnalysis.MisraGries(capacity)
      state.getOption.foreach(s => mg.restore(s.counts, s.np, s.dp))
      rows.foreach(r => mg.add(r._2))
      val out = MgSummary(shard, mg.snapshot, mg.tokens, mg.deficit)
      state.update(out)
      Iterator.single(out)
    }
    docs
      .select(explode(split(col(textCol), " ")).as("tok"))
      .select(pmod(xxhash64(col("tok")), lit(shards.toLong)).cast("int")
        .as("shard"), col("tok"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Click→conversion attribution pairs: every (click, conversion) by
    * the same `key` with the conversion inside
    * `[click, click + windowMinutes)` — the canonical watermarked
    * STREAM-STREAM interval join (the one streaming join shape the
    * surface lacked: [[enrichAsof]] is stream-static). The same plan
    * runs batch-on-batch (it is just an equi-join on `key` plus a time
    * range), which is what the stream ≡ batch spec exploits.
    *
    * Streaming semantics: BOTH inputs must carry `withWatermark` on
    * their time columns. Because the join condition bounds each side's
    * event time by the other's (conversion ∈ [click, click+W)), Spark
    * derives state-eviction watermarks for both buffers: a click
    * evicts once the conversion watermark passes click+W, a conversion
    * once the click watermark passes it — state is O(rate × (W +
    * watermark delay)) per side forever, never input-proportional.
    * Append mode, no aggregation; last-click reduction is a downstream
    * concern ([[graft.operators.AsofJoin]] batch-side).
    *
    * Scale shape (batch): equi-join keyed by `key`; the range predicate
    * prunes pairs per key group. A whale key pays |clicks_k|×|conv_k|
    * candidate pairs pre-filter — same blow-up DuckDB's range join
    * pays — and the fix at 100 TB is time-bucketing the equi-key
    * ([[graft.operators.RangeJoin]]'s binned form) rather than salting,
    * since the range predicate is what carries the selectivity.
    *
    * @param clicks      side whose time opens the window; all columns kept
    * @param conversions side whose time must fall inside the window;
    *                    non-`key` columns must not collide with clicks'
    */
  def attributionPairs(clicks: DataFrame, conversions: DataFrame,
      key: String, clickTime: String, convTime: String,
      windowMinutes: Int): DataFrame = {
    require(windowMinutes > 0, s"windowMinutes must be positive: $windowMinutes")
    val shared = (clicks.columns.toSet & conversions.columns.toSet) - key
    require(shared.isEmpty, s"non-key column collision: ${shared.mkString(", ")}")
    // Rename the conversion side's key so the two plans share NO column
    // name: when both sides derive from the same source DataFrame,
    // `clicks(key) === conversions(key)` resolves both references to
    // the SAME attribute — a trivially-true predicate that silently
    // degrades the equi-join to a time-filtered cross join.
    val convs = conversions.withColumnRenamed(key, "__convkey")
    val cond = col(key) === col("__convkey") &&
      col(convTime) >= col(clickTime) &&
      col(convTime) < col(clickTime) + expr(s"INTERVAL '$windowMinutes' MINUTE")
    clicks.join(convs, cond)
      .select((clicks.columns ++ conversions.columns.filter(_ != key))
        .map(col).toSeq: _*)
  }
}

package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC → corpus: the crawl-side preparation stage that turns raw
  * crawl records into the `docs` relation every downstream operator
  * consumes ([[CorpusPipeline.run]] for batch curation,
  * [[graft.streaming.CorpusStream.run]] for ingest). One call covers
  * the steps a real crawl corpus runs between "bytes in a segment"
  * and "documents":
  *
  *   1. robots.txt RESPONSES ARE IN THE CRAWL — crawlers archive them
  *      like any fetch — so the rule set comes from the records
  *      themselves ([[Robots.parseRules]] over `…/robots.txt` bodies)
  *      and pages the rules disallow for `agent` drop
  *      ([[Robots.verdicts]], broadcast — compliance re-checked at
  *      corpus-build time, not just crawl time, the governance shape).
  *   2. HTML-typed responses decode and extract: `<title>`, plus
  *      either jusText main content ([[TextAnalysis.htmlMainContent]],
  *      boilerplate dropped) or the full visible text.
  *   3. doc ids mint deterministically (xxhash64 of the WARC record
  *      id), `source` = the page's host — the per-source column
  *      mixture/quality calibration key on.
  *
  * Scale shape: robots bodies are O(hosts) and broadcast (or a plan
  * literal on the streaming path); EVERYTHING else is one narrow
  * scan-fused projection — title and blocks come out of a single
  * parse, main-content classification is a per-row HOF over the block
  * array. Zero shuffles between segment bytes and documents.
  */
object CrawlPipeline {

  /** `httpEnvelope = true` for crawls whose `response` payloads carry
    * the FULL HTTP response (status line + headers + body — the Common
    * Crawl WARC layout, ISO 28500 §6.3): pages gate on parsed status
    * 2xx + a declared html media type, bodies slice out of the
    * envelope ([[Http.body]], binary-safe), and the declared charset
    * picks the decode (utf-8 default; iso-8859-1 honored — the two
    * encodings that cover the overwhelming share of the web). False =
    * payloads are bare bodies with the WARC `content_type` column as
    * the type signal (the WET-like layout the batch fixtures use).
    */
  final case class CrawlSettings(
      agent: String = "*",
      respectRobots: Boolean = true,
      mainContentOnly: Boolean = true,
      minChars: Int = 25,
      linkNum: Int = 1, linkDen: Int = 5,
      stopNum: Int = 1, stopDen: Int = 10,
      httpEnvelope: Boolean = false)

  private def hostOf(url: org.apache.spark.sql.Column) =
    lower(regexp_extract(url, "(?i)^https?://([^/:]+)", 1))

  private def isRobotsUrl(url: org.apache.spark.sql.Column) =
    url.rlike("(?i)^https?://[^/]+/robots\\.txt$")

  /** The page body as TEXT: envelope-aware slice + charset-aware
    * decode (scan-fused; the envelope parse is built-in expressions,
    * so this stays one narrow projection either way).
    */
  private def pageText(s: CrawlSettings): org.apache.spark.sql.Column =
    if (!s.httpEnvelope) decode(col("payload"), "UTF-8")
    else Http.decodedBody(col("payload"))

  private def htmlPages(records: DataFrame,
      s: CrawlSettings = CrawlSettings()): DataFrame = {
    val base = records.filter(col("record_type") === "response")
      .filter(!isRobotsUrl(col("target_uri")))
    if (s.httpEnvelope)
      base.filter(Http.statusCode(col("payload")).between(200, 299))
        .filter(coalesce(Http.mediaType(col("payload")), lit(""))
          .contains("html"))
    else
      base.filter(coalesce(col("content_type"), lit("")).contains("html"))
  }

  /** The per-record projection — entirely narrow (the main-content
    * classification is a per-row HOF over the parse's block array), so
    * it runs identically on a batch relation and on a readStream in
    * append mode.
    */
  private def project(allowed: DataFrame, s: CrawlSettings): DataFrame = {
    // ONE parse per page: title and blocks come from the same htmlDoc
    // struct (Catalyst's subexpression elimination evaluates the
    // kernel once per row); separate htmlTitle + htmlBlocks columns
    // would run the state machine twice, and at crawl scale the parse
    // IS the extraction cost
    val doc = TextFunctions.htmlDoc(pageText(s))
    val blocks = doc.getField("blocks")
    val text =
      if (s.mainContentOnly)
        TextAnalysis.mainContentColsFromBlocks(blocks,
          minChars = s.minChars, linkNum = s.linkNum, linkDen = s.linkDen,
          stopNum = s.stopNum, stopDen = s.stopDen)._1
      else // full visible text == blocks joined by newline
        array_join(transform(blocks, b => b.getField("text")), "\n")
    allowed.select(
      xxhash64(col("record_id")).as("doc_id"),
      col("target_uri").as("url"),
      hostOf(col("target_uri")).as("source"),
      to_timestamp(col("warc_date")).as("ts"),
      doc.getField("title").as("title"),
      text.as("text"))
  }

  /** `records`: the WARC relation
    * (`spark.read.format("warc").load(dir)`). Returns
    * (doc_id, url, source, ts, title, text).
    */
  def fromWarc(records: DataFrame,
      s: CrawlSettings = CrawlSettings()): DataFrame = {
    val pages = htmlPages(records, s)
    val allowed =
      if (!s.respectRobots) pages
      else {
        val robotsRecs = records.filter(col("record_type") === "response")
          .filter(isRobotsUrl(col("target_uri")))
        val robots =
          if (!s.httpEnvelope)
            robotsRecs.select(hostOf(col("target_uri")).as("host"),
              decode(col("payload"), "UTF-8").as("robots_text"))
          else {
            // envelope mode splits by status per RFC 9309: 2xx carries
            // rules; 4xx means unrestricted (§2.3.1.3 — the record just
            // drops, and an absent rule row already yields that here);
            // 5xx means the host's rules are UNREACHABLE and the
            // crawler MUST assume complete disallow (§2.3.1.4) — so a
            // host whose ONLY robots answers are 5xx gets a synthetic
            // disallow-all rule row. A host with any 2xx copy in the
            // same archive uses it (the cached-copy allowance). The
            // error relation is host-distinct — tiny next to pages.
            val status = Http.statusCode(col("payload"))
            val ok = robotsRecs.filter(status.between(200, 299))
              .select(hostOf(col("target_uri")).as("host"),
                decode(Http.body(col("payload")), "UTF-8").as("robots_text"))
            val erred = robotsRecs.filter(status >= 500)
              .select(hostOf(col("target_uri")).as("host")).distinct()
              .join(ok.select(col("host")).distinct(), Seq("host"),
                "left_anti")
              .select(col("host"),
                lit("User-agent: *\nDisallow: /").as("robots_text"))
            ok.unionByName(erred)
          }
        Robots.filterAllowed(pages, "target_uri",
          Robots.parseRules(robots, "host", "robots_text", s.agent))
      }
    project(allowed, s)
  }

  /** Per-host crawl-rate ("politeness") accounting from the fetch
    * timestamps the WARC records already carry — the audit artifact a
    * crawl operator publishes (did we hammer anyone?) and the input to
    * per-host rate caps on the next crawl. Output per host:
    * `n_fetches`, `first_s`/`last_s` (epoch seconds), `min_gap_s`
    * (smallest inter-fetch gap), `mean_gap_s` (fetch-span / (n−1) —
    * the telescoped mean, no window needed), `max_per_minute` (the
    * busiest minute's fetch count).
    *
    * Scale shape: the naive form — one window over each host's full
    * fetch history — serializes a whale host (10⁸ fetches) into one
    * sort task. Instead the adjacent-gap scan runs HIERARCHICALLY:
    * sort within (host, minute) buckets (bounded by the per-minute
    * fetch ceiling, exactly what politeness bounds), then one tiny
    * per-host pass over bucket summaries (O(minutes) rows) for the
    * boundary gaps; min over both levels is exact because every
    * adjacent pair is either intra-bucket or a bucket boundary. The
    * bucket width is the skew knob — a host violating politeness so
    * hard that one MINUTE overflows a task is the finding, not a
    * performance bug.
    */
  def hostFetchStats(records: DataFrame, urlCol: String = "target_uri",
      dateCol: String = "warc_date"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fetches = records.select(hostOf(col(urlCol)).as("host"),
        unix_timestamp(to_timestamp(col(dateCol))).as("t"))
      .filter(col("host") =!= "" && col("t").isNotNull)
      .withColumn("b", expr("t div 60"))
    val inBucket = Window.partitionBy(col("host"), col("b")).orderBy(col("t"))
    val buckets = fetches
      .withColumn("gap", col("t") - lag(col("t"), 1).over(inBucket))
      .groupBy(col("host"), col("b"))
      .agg(count(lit(1)).as("nb"), min(col("t")).as("tmin"),
        max(col("t")).as("tmax"), min(col("gap")).as("gmin"))
    val byBucket = Window.partitionBy(col("host")).orderBy(col("b"))
    buckets
      .withColumn("bgap", col("tmin") - lag(col("tmax"), 1).over(byBucket))
      .groupBy(col("host"))
      .agg(sum(col("nb")).as("n_fetches"), min(col("tmin")).as("first_s"),
        max(col("tmax")).as("last_s"),
        least(min(col("gmin")), min(col("bgap"))).as("min_gap_s"),
        max(col("nb")).as("max_per_minute"))
      .withColumn("mean_gap_s",
        when(col("n_fetches") > 1, round(
          (col("last_s") - col("first_s")) /
            (col("n_fetches") - 1).cast("double"), 6)))
      .select(col("host"), col("n_fetches"), col("first_s"), col("last_s"),
        col("min_gap_s"), col("mean_gap_s"), col("max_per_minute"))
  }

  /** Streaming politeness monitor — the live form of
    * [[hostFetchStats]]'s busiest-minute ceiling: per-(host, minute)
    * fetch counts over a WARC `readStream`, watermarked so state for
    * closed minutes is dropped (bounded by active-hosts ×
    * watermark-minutes, not crawl length). Alert-side consumers join
    * this against per-host rate caps while the crawl is still
    * running, instead of discovering a hammered host in the
    * post-crawl audit. Pure keyed windowed count — partial-aggregated
    * map-side, and the same expression runs unchanged on a batch
    * relation (the watermark is a no-op there; spec-pinned twin).
    */
  def fetchRateByMinute(records: DataFrame, urlCol: String = "target_uri",
      dateCol: String = "warc_date",
      watermark: String = "10 minutes"): DataFrame =
    records.select(hostOf(col(urlCol)).as("host"),
        to_timestamp(col(dateCol)).as("__ts"))
      .filter(col("host") =!= "" && col("__ts").isNotNull)
      .withWatermark("__ts", watermark)
      .groupBy(col("host"), window(col("__ts"), "1 minute").as("__w"))
      .agg(count(lit(1)).as("n_fetches"))
      .select(col("host"), col("__w.start").as("minute_start"),
        col("n_fetches"))

  /** Politeness violations, LIVE: [[fetchRateByMinute]] enriched
    * stream-static against the declared [[Robots.parseCrawlDelay]]
    * caps (broadcast — O(hosts), the robots contract). A minute
    * violates when it holds more fetches than ANY delay-compliant
    * schedule could place in an aligned 60 s window — exactly
    * ceil(60/delay) = (60 + delay − 1) div delay fetches — so the
    * flag never false-positives on a compliant-but-bursty-looking
    * boundary. Hosts declaring no delay never violate. The join is
    * stateless, so the whole thing streams in the watermarked
    * append/complete modes of the underlying windowed count; the
    * identical expression is the batch audit (spec-pinned twin).
    */
  def rateViolations(records: DataFrame, delays: DataFrame,
      urlCol: String = "target_uri", dateCol: String = "warc_date",
      watermark: String = "10 minutes"): DataFrame =
    fetchRateByMinute(records, urlCol, dateCol, watermark)
      .join(broadcast(delays), Seq("host"), "left")
      // delay_s > 0 guard: [[Robots.parseCrawlDelay]] drops zero
      // delays, but a caller-supplied delays relation may carry
      // `Crawl-delay: 0` rows (real robots files publish them; zero
      // means "no delay"), and an unguarded div would be a
      // DIVIDE_BY_ZERO under ANSI mode — killing the whole streaming
      // query on one line of untrusted crawl input. Null cap =
      // never violates, the correct semantics for "no delay".
      .withColumn("cap", when(col("delay_s") > 0,
        expr("(60 + delay_s - 1) div delay_s")))
      .withColumn("violation",
        coalesce(col("n_fetches") > col("cap"), lit(false)))
      .select(col("host"), col("minute_start"), col("n_fetches"),
        col("cap"), col("violation"))

  /** Frontier scheduling v2 — rank per AVAILABLE FETCH SLOT: the
    * politeness budget, not the fetch history, is the cost. A host's
    * declared Crawl-delay bounds how many fetches any compliant
    * schedule can place per minute — slots = ceil(60/delay), exactly
    * [[rateViolations]]' cap — so the value of one slot at a host is
    * rank div slots: a high-rank host that only admits 6 fetches a
    * minute outranks an equal-rank host with 60 cheap slots, and the
    * scheduler fills the most valuable slots first. Hosts declaring
    * no delay (or a junk value ≤ 0) get `defaultDelayS`.
    *
    * `ranks`: (node, rank) from [[LinkGraph.pageRankInt]]; `delays`:
    * (host, delay_s) from [[Robots.parseCrawlDelay]] — O(hosts),
    * broadcast. Integer-exact end to end, so the schedule is
    * reproducible and oracle-replayable.
    */
  def frontierSlots(ranks: DataFrame, delays: DataFrame,
      defaultDelayS: Long = 1L): DataFrame = {
    require(defaultDelayS > 0, "defaultDelayS must be > 0")
    ranks.join(broadcast(delays), ranks("node") === delays("host"), "left")
      .select(col("node").as("host"), col("rank").as("pr"),
        when(col("delay_s") > 0, col("delay_s"))
          .otherwise(lit(defaultDelayS)).as("delay_s"))
      .withColumn("slots_per_min", expr("(60 + delay_s - 1) div delay_s"))
      .withColumn("priority", expr("pr div slots_per_min"))
  }

  /** The governance loop CLOSED LIVE: [[fromWarcStream]]'s document
    * chain with the [[rateViolations]] cap composed in as a gate —
    * fetches landing in a minute that exceeds the host's
    * declared-Crawl-delay cap divert instead of entering the corpus.
    *
    * An exact gate can't decide until the minute CLOSES (fetch #7
    * retroactively convicts fetches #1–6), so the minute's pages
    * buffer in ONE windowed aggregation: declared caps join
    * broadcast stream-static (stateless) BEFORE the aggregate, then
    * groupBy (host, 1-minute window, cap) collects the minute's page
    * records and counts them; the explode afterwards is stateless, so
    * the whole query is a single stateful operator — squarely inside
    * Structured Streaming's supported append-mode shapes (an
    * aggregate feeding a stream-stream join is not). Per-key state is
    * bounded by one minute of one host's fetches — a host whose
    * single minute overflows an executor IS the violation finding,
    * the same boundedness argument as [[hostFetchStats]].
    *
    * The identical expression runs batch-side (spec-pinned twin).
    * Returns (docs, diverted): allowed documents ready for
    * [[graft.streaming.CorpusStream.run]], and the dead-letter
    * relation (url, host, minute_start, n_fetches, cap) a crawl
    * operator audits.
    */
  def fromWarcStreamPolite(records: DataFrame, staticRules: DataFrame,
      delays: DataFrame, s: CrawlSettings = CrawlSettings(),
      watermark: String = "10 minutes"): (DataFrame, DataFrame) = {
    val pages = htmlPages(records, s)
    val allowed =
      if (s.respectRobots)
        Robots.filterAllowedLit(pages, "target_uri", staticRules)
      else pages
    val gated = allowed
      .withColumn("__h", hostOf(col("target_uri")))
      .withColumn("__ts", to_timestamp(col("warc_date")))
      .join(broadcast(delays), col("__h") === delays("host"), "left")
      .withColumn("cap", when(col("delay_s") > 0,
        expr("(60 + delay_s - 1) div delay_s")))
      .withWatermark("__ts", watermark)
      .groupBy(col("__h"), window(col("__ts"), "1 minute").as("__w"),
        col("cap"))
      .agg(count(lit(1)).as("n_fetches"),
        collect_list(struct(col("record_id"), col("target_uri"),
          col("warc_date"), col("payload"))).as("__pages"))
      .withColumn("violation",
        coalesce(col("n_fetches") > col("cap"), lit(false)))
      .select(col("__h"), col("__w.start").as("minute_start"), col("cap"),
        col("n_fetches"), col("violation"), explode(col("__pages")).as("__p"))
      .select(col("__h"), col("minute_start"), col("cap"), col("n_fetches"),
        col("violation"), col("__p.record_id").as("record_id"),
        col("__p.target_uri").as("target_uri"),
        col("__p.warc_date").as("warc_date"),
        col("__p.payload").as("payload"))
    val docs = project(gated.filter(!col("violation")), s)
    val diverted = gated.filter(col("violation"))
      .select(col("target_uri").as("url"), col("__h").as("host"),
        col("minute_start"), col("n_fetches"), col("cap"))
    (docs, diverted)
  }

  /** Cross-crawl DIFF — what changed between two crawls of the same
    * web: per URL, `added` (fetched only in the new crawl), `gone`
    * (only in the old), `changed` (fetched in both, payload differs),
    * `same`. The input relations are WARC-shaped (`response` records
    * with `urlCol`/`payloadCol`/`dateCol`); a URL fetched several
    * times within one crawl resolves to its LATEST fetch's payload
    * (max by date, hash as the deterministic tiebreak) before the
    * comparison — the keyed-MERGE convention ([[Upsert.mergeLatest]]).
    *
    * Scale shape: each side reduces to (url, 8-byte payload hash)
    * before anything joins — one partial-aggregated groupBy per crawl,
    * then a full-outer equi-join of two narrow relations. Payload
    * bytes never shuffle; at 100 TB the diff moves ~(urls × 16 bytes).
    * Output: (url, status, old_hash, new_hash) — the hashes are the
    * audit columns (null on the absent side).
    */
  def crawlDiff(oldRecords: DataFrame, newRecords: DataFrame,
      urlCol: String = "target_uri", payloadCol: String = "payload",
      dateCol: String = "warc_date"): DataFrame =
    crawlHashes(oldRecords, "old_hash", urlCol, payloadCol, dateCol)
      .join(crawlHashes(newRecords, "new_hash", urlCol, payloadCol, dateCol),
        Seq("url"), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("gone"))
          .when(col("old_hash") === col("new_hash"), lit("same"))
          .otherwise(lit("changed")))
      .select(col("url"), col("status"), col("old_hash"), col("new_hash"))

  /** One crawl reduced to its (url, latest-fetch payload hash)
    * relation — the 16-bytes-per-URL summary [[crawlDiff]] joins and
    * [[crawlDiffStream]] broadcasts. Persist THIS between crawls, not
    * payloads.
    */
  def crawlHashes(records: DataFrame, hashOut: String = "hash",
      urlCol: String = "target_uri", payloadCol: String = "payload",
      dateCol: String = "warc_date"): DataFrame =
    records.filter(col("record_type") === "response")
      .select(col(urlCol).as("url"),
        unix_timestamp(to_timestamp(col(dateCol))).as("__t"),
        xxhash64(col(payloadCol)).as("__h"))
      .groupBy(col("url"))
      .agg(max(struct(col("__t"), col("__h"))).getField("__h").as(hashOut))

  /** [[crawlDiff]] LIVE — the re-crawl trigger feed: a streaming new
    * crawl judged per fetch against the previous crawl's
    * [[crawlHashes]] relation (static, broadcast — the stream-static
    * dimension pattern). Emits (url, status ∈ added/changed/same,
    * old_hash, new_hash) in append mode with NO state: each fetch is
    * judged as it lands (a re-fetched URL is judged per fetch — live
    * semantics; the batch [[crawlDiff]] is the latest-wins audit).
    * `gone` is inherently an end-of-crawl verdict and stays
    * batch-side. Identical expression runs on a batch frame
    * (spec-pinned twin).
    */
  def crawlDiffStream(newRecords: DataFrame, oldHashes: DataFrame,
      urlCol: String = "target_uri",
      payloadCol: String = "payload"): DataFrame = {
    val hashCol = oldHashes.columns.filter(_ != "url") match {
      case Array(h) => h
      case other => sys.error("oldHashes must be (url, <hash>) — the " +
        s"crawlHashes shape; got ${other.mkString(",")}")
    }
    newRecords.filter(col("record_type") === "response")
      .select(col(urlCol).as("url"), xxhash64(col(payloadCol)).as("new_hash"))
      .join(broadcast(oldHashes.select(col("url"),
        col(hashCol).as("old_hash"))), Seq("url"), "left")
      .withColumn("status",
        when(col("old_hash").isNull, lit("added"))
          .when(col("old_hash") === col("new_hash"), lit("same"))
          .otherwise(lit("changed")))
      .select(col("url"), col("status"), col("old_hash"), col("new_hash"))
  }

  /** WARC revisit-record planning (ISO 28500 §6.7.2, the
    * identical-payload-digest profile Common Crawl stores): a response
    * whose payload digest was already archived becomes a `revisit`
    * record pointing at the first archived copy (WARC-Refers-To) and
    * stores headers only — the storage-side dedup that keeps a
    * recrawl-heavy archive linear in DISTINCT content, not fetches.
    * The canonical copy per digest is the earliest (fetch time, id) —
    * one partial-aggregable min(struct) per digest, the
    * [[crawlHashes]] discipline: payload bytes never shuffle, a
    * 20-byte digest + keys do (`unhex(sha1(...))` — BINARY(20), not
    * the 40-char hex string, which would double the shuffle width;
    * since round 16 the `digest` column's type is BINARY — callers
    * that rendered the old hex string should `hex(digest)`).
    * The digest is SHA-1, NOT xxhash64:
    * this operator's verdict is "store headers only, the payload is
    * over there", so a digest collision between DISTINCT payloads
    * silently archives the wrong bytes — at multi-billion-record
    * archive scale 64-bit birthday collisions are expected
    * (~50% at 5·10⁹ records), which is exactly why the WARC
    * identical-payload-digest profile (and Common Crawl's CDX) pins a
    * cryptographic digest. [[crawlDiff]] keeps xxhash64 because its
    * failure mode is one "changed" misreported as "same" — a missed
    * recrawl, not a corrupted archive. Output: every response row as
    * (id, url, t, digest, kind ∈ response|revisit, refers_to —
    * null on the canonical).
    */
  def revisitRecords(records: DataFrame, idCol: String = "record_id",
      urlCol: String = "target_uri", payloadCol: String = "payload",
      dateCol: String = "warc_date"): DataFrame = {
    val resp = records.filter(col("record_type") === "response")
      .select(col(idCol).as("id"), col(urlCol).as("url"),
        unix_timestamp(to_timestamp(col(dateCol))).as("t"),
        unhex(sha1(col(payloadCol))).as("digest"))
    val canon = resp.groupBy(col("digest"))
      .agg(min(struct(col("t"), col("id"))).as("__c"))
      .select(col("digest"), col("__c.id").as("__cid"))
    resp.join(canon, Seq("digest"))
      .withColumn("kind",
        when(col("id") === col("__cid"), lit("response"))
          .otherwise(lit("revisit")))
      .withColumn("refers_to",
        when(col("kind") === "revisit", col("__cid")))
      .select(col("id"), col("url"), col("t"), col("digest"),
        col("kind"), col("refers_to"))
  }

  /** MIRROR-HOST detection: hosts serving (near-)identical content
    * sets — www/apex aliases, CDN mirrors, scraper clones — the hosts
    * a crawler should collapse to one politeness budget and one
    * frontier entry instead of crawling N times. Input: a
    * (host, content-key) relation — [[crawlHashes]] plus [[hostOf]]
    * in production, where the key is the 8-byte payload hash; any
    * equality-comparable key column works. Per host the DISTINCT key
    * set; host pairs sharing keys get an EXACT Jaccard: self-join the
    * (key, host) relation on key (host_a < host_b), count per pair,
    * join the two set sizes, `inter / (size_a + size_b - inter)`.
    *
    * Scale shape: payloads never move — the relation is host + 8-byte
    * key. The pair fan-out is bounded by the key df (hosts per key):
    * content keys are overwhelmingly df=1-2 (a page lives on one host;
    * mirrored pages on the mirror count), so the self-join is linear
    * in mirrored pages. The adversarial head — a boilerplate page
    * (error/parking page) byte-identical across millions of hosts —
    * explodes quadratically; `maxKeyDf` prunes keys above the cap
    * BEFORE the join (observe metric `mirror_skew_cap` reports pruned
    * keys). The cap is LOSSY the same way [[Dedup.jaccardPairsGrouped]]'s
    * is — a pruned key leaves both hosts' sizes but not their
    * intersection, underestimating Jaccard — and a parking page shared
    * by 10^6 hosts is exactly the content that should NOT vote for
    * "mirror", so the prune is semantics, not just safety. At 10^8
    * hosts the candidate stage moves to [[mirrorHostsLsh]]'s banded
    * signatures; this exact form is its verify stage.
    */
  def mirrorHosts(pages: DataFrame, hostCol: String, keyCol: String,
      threshold: Double = 0.9, maxKeyDf: Long = 0L): DataFrame = {
    val rel = pages.select(col(hostCol).as("__host"), col(keyCol).as("__k"))
      .distinct()
    val sizes = rel.groupBy(col("__host")).agg(count(lit(1)).as("sz"))
    var keyed = rel
    if (maxKeyDf > 0) {
      val df = rel.groupBy(col("__k")).agg(count(lit(1)).as("__df"))
        .observe("mirror_skew_cap",
          sum(when(col("__df") > maxKeyDf, 1L).otherwise(0L))
            .as("pruned_keys"))
      keyed = rel.join(df.filter(col("__df") <= maxKeyDf), Seq("__k"))
        .select(col("__host"), col("__k"))
    }
    val a = keyed.select(col("__host").as("host_a"), col("__k"))
    val b = keyed.select(col("__host").as("host_b"), col("__k"))
    val inter = a.join(b, Seq("__k"))
      .filter(col("host_a") < col("host_b"))
      .groupBy(col("host_a"), col("host_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("__host").as("host_a"), col("sz").as("size_a")),
        Seq("host_a"))
      .join(sizes.select(col("__host").as("host_b"), col("sz").as("size_b")),
        Seq("host_b"))
      .withColumn("jaccard",
        col("inter") / (col("size_a") + col("size_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("host_a"), col("host_b"), col("size_a"), col("size_b"),
        col("inter"), col("jaccard"))
  }

  /** READ-side revisit resolution — the consumer of
    * [[revisitRecords]]' archives: headers-only `revisit` rows recover
    * their payload from the canonical response they refer to, so a
    * deduplicated archive reads back as if every fetch were stored in
    * full. One equi-join of the revisit rows against the canonical
    * (id, payload) relation — canonical payloads move once each;
    * response rows never join (union of the two splits, the
    * dead-letter discipline). Input needs (record_id, record_type,
    * payload, refers_to — null on responses); every other column
    * passes through. Output adds `resolved_from` (null on originals)
    * and fills `payload` on revisits.
    */
  def resolveRevisits(records: DataFrame): DataFrame = {
    val keep = records.columns
      .filterNot(c => c == "payload" || c == "refers_to").map(col)
    val canon = records.filter(col("record_type") === "response")
      .select(col("record_id").as("__cid"), col("payload").as("__cpay"))
    val rfType = records.schema("refers_to").dataType
    val responses = records.filter(col("record_type") === "response")
      .select(keep :+ col("payload") :+
        lit(null).cast(rfType).as("__rf"): _*)
    val revisits = records.filter(col("record_type") === "revisit")
      .join(canon, col("refers_to") === col("__cid"))
      .select(keep :+ col("__cpay").as("payload") :+
        col("refers_to").as("__rf"): _*)
    responses.unionByName(revisits)
      .withColumnRenamed("__rf", "resolved_from")
  }

  /** NEAR-mirror hosts — [[mirrorHosts]] for template-drifted mirrors:
    * hosts whose pages are NEAR-duplicates of each other's (scraper
    * clones that stamp their own header, mirrors a revision behind),
    * which exact payload keys can never match. Page-level near-dup
    * pairs come from the banded MinHash+LSH candidate stage with exact
    * verify ([[Dedup.minhashLshPairs]] — the web-scale DEFAULT since
    * round 15, measured 4× over the exact pairwise verify at the sf10
    * probe and widening with corpus size); `lshPairs = false` swaps in
    * the exact prefix-filtered Jaccard
    * ([[Dedup.jaccardPairsPrefix]], same contract — the oracle
    * anchor); cross-host pairs roll up per
    * (host, host) with the matched-page count on EACH side, and the
    * host score is (matched_a + matched_b) / (size_a + size_b) — 1.0
    * when every page on both hosts has a near-twin across, symmetric,
    * and insensitive to which side is bigger. Output:
    * (host_a, host_b, matched_a, matched_b, size_a, size_b, score)
    * with score ≥ hostThreshold.
    */
  def nearMirrorHosts(pages: DataFrame, hostCol: String, idCol: String,
      textCol: String, k: Int = 3, pageThreshold: Double = 0.8,
      hostThreshold: Double = 0.5, lshPairs: Boolean = true): DataFrame = {
    val pg = pages.select(col(hostCol).as("__host"), col(idCol).as("__pid"),
      col(textCol).as("__text"))
    // exact prefix filtering pays the full pairwise verify on a
    // mirror-heavy corpus (every page has a twin — measured at the sf10
    // probe corpus: 42 s exact vs 11 s via banding, the gap widening
    // with corpus size), so since round 15 the MinHash+LSH candidate
    // stage with exact verify IS the default — same pair set up to the
    // banding bound (miss ≤ (1−s^r)^b ≈ 4e-8 at s ≥ 0.8), equality
    // spec-pinned on the drifted-twin corpus. `lshPairs = false` keeps
    // the exact prefix-filtered form as the oracle anchor.
    val pairs = (if (lshPairs)
        Dedup.minhashLshPairs(pg, "__pid", "__text",
          k = k, threshold = pageThreshold)
      else Dedup.jaccardPairsPrefix(pg, "__pid", "__text",
        k = k, threshold = pageThreshold))
      .select(col("id_a"), col("id_b"))
    val hosts = pg.select(col("__pid"), col("__host"))
    val cross = pairs
      .join(hosts.select(col("__pid").as("id_a"), col("__host").as("ha")),
        Seq("id_a"))
      .join(hosts.select(col("__pid").as("id_b"), col("__host").as("hb")),
        Seq("id_b"))
      .filter(col("ha") =!= col("hb"))
      .select(least(col("ha"), col("hb")).as("host_a"),
        greatest(col("ha"), col("hb")).as("host_b"),
        when(col("ha") < col("hb"), col("id_a")).otherwise(col("id_b"))
          .as("pa"),
        when(col("ha") < col("hb"), col("id_b")).otherwise(col("id_a"))
          .as("pb"))
    val sizes = pg.groupBy(col("__host")).agg(count(lit(1)).as("sz"))
    cross.groupBy(col("host_a"), col("host_b"))
      .agg(countDistinct(col("pa")).as("matched_a"),
        countDistinct(col("pb")).as("matched_b"))
      .join(sizes.select(col("__host").as("host_a"), col("sz").as("size_a")),
        Seq("host_a"))
      .join(sizes.select(col("__host").as("host_b"), col("sz").as("size_b")),
        Seq("host_b"))
      .withColumn("score", (col("matched_a") + col("matched_b")) /
        (col("size_a") + col("size_b")))
      .filter(col("score") >= hostThreshold)
      .select(col("host_a"), col("host_b"), col("matched_a"),
        col("matched_b"), col("size_a"), col("size_b"), col("score"))
  }

  /** [[mirrorHosts]] at 10⁸-host scale: MinHash signatures per host +
    * LSH banding for the candidate stage, exact Jaccard verify of
    * candidates only (the [[Dedup.minhashLshPairs]] discipline on
    * host-level key sets). The signature is NEVER a materialized set:
    * coordinate i is `min(xxhash64(key, i))` — 32 partial-aggregable
    * `min`s in ONE groupBy, so a whale host folds map-side and no
    * collect_set ever holds its millions of keys. Bands self-join on
    * (band, bucket-hash); candidate pairs verify against the keyed
    * relation with two joins bounded by candidate count × set size.
    *
    * `maxKeyDf` here drops hot keys BEFORE the signature (unlike
    * [[mirrorHosts]]' intersection-only cap): a parking page shared by
    * 10⁶ hosts makes those hosts GENUINE mutual mirrors — a quadratic
    * clique no candidate stage can bound — so the boilerplate key must
    * leave the universe, sizes included, for the output to stay
    * linear. Hosts left with empty key sets exit the relation. The
    * miss bound is the usual banding one: P(miss) = (1−s^r)^b.
    */
  def mirrorHostsLsh(pages: DataFrame, hostCol: String, keyCol: String,
      threshold: Double = 0.9, bands: Int = 16, rowsPerBand: Int = 2,
      maxKeyDf: Long = 0L): DataFrame = {
    val n = bands * rowsPerBand
    var rel = pages.select(col(hostCol).as("__host"), col(keyCol).as("__k"))
      .distinct()
    if (maxKeyDf > 0) {
      val df = rel.groupBy(col("__k")).agg(count(lit(1)).as("__df"))
        .observe("mirror_lsh_skew_cap",
          sum(when(col("__df") > maxKeyDf, 1L).otherwise(0L))
            .as("pruned_keys"))
      rel = rel.join(df.filter(col("__df") <= maxKeyDf), Seq("__k"))
        .select(col("__host"), col("__k"))
    }
    rel = rel.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigAggs = (0 until n)
      .map(i => min(xxhash64(col("__k"), lit(i))).as(s"__m$i"))
    val sig = rel.groupBy(col("__host"))
      .agg(sigAggs.head, sigAggs.tail: _*)
      .select(col("__host"),
        array((0 until n).map(i => col(s"__m$i")): _*).as("sig"))
    val b = sig.select(col("__host"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        bi => hash(slice(col("sig"), bi * rowsPerBand + 1, lit(rowsPerBand)))))
        .as(Seq("band", "bh")))
    val cand = b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.__host") < col("b.__host"))
      .select(col("a.__host").as("host_a"), col("b.__host").as("host_b"))
      .distinct()
    val sizes = rel.groupBy(col("__host")).agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(rel.select(col("__host").as("host_a"), col("__k")), Seq("host_a"))
      .join(rel.select(col("__host").as("host_b"), col("__k")),
        Seq("host_b", "__k"))
      .groupBy(col("host_a"), col("host_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("__host").as("host_a"), col("sz").as("size_a")),
        Seq("host_a"))
      .join(sizes.select(col("__host").as("host_b"), col("sz").as("size_b")),
        Seq("host_b"))
      .withColumn("jaccard",
        col("inter") / (col("size_a") + col("size_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("host_a"), col("host_b"), col("size_a"), col("size_b"),
        col("inter"), col("jaccard"))
  }

  /** Sitemap (sitemaps.org XML) entries as a relation: one row per
    * `<url>` element with its `<loc>` and optional `<lastmod>`. Pure
    * built-in string ops — split on the `</url>` close tag, require
    * the `<url>` OPEN tag in the chunk and anchor each field extract
    * after its last occurrence — so the parse fuses into the sitemap
    * scan (sitemaps are O(hosts·50k) entries, tiny next to the crawl;
    * the 50k-URL/50 MB caps are the spec's own). The open-tag anchor
    * is what keeps a sitemap INDEX file honest: an index
    * (`<sitemapindex><sitemap><loc>…`) has no `<url>` elements at
    * all, so it contributes ZERO rows here instead of leaking its
    * first child-sitemap URL as a bogus page entry — route index
    * files through [[sitemapIndexEntries]] to get the child sitemaps.
    * Entities in `<loc>` decode per the spec's escaping table (the
    * four XML metacharacters + apostrophe). Keeps every caller column
    * (host, fetch time, …) alongside (url, lastmod).
    */
  def sitemapEntries(sitemaps: DataFrame, xmlCol: String): DataFrame =
    elementEntries(sitemaps, xmlCol, tag = "url", outCol = "url")

  /** Sitemap INDEX (sitemaps.org `<sitemapindex>`) entries: one row
    * per `<sitemap>` element — the child sitemap's `<loc>` (as
    * `sitemap_url`) and optional `<lastmod>`. The fetch loop is:
    * index files through here, fetch the children, children through
    * [[sitemapEntries]]. Same scan-fused string-op parse; a plain
    * urlset file contributes zero rows here (no `<sitemap>`
    * elements), so the two parsers partition any mixed input cleanly.
    */
  def sitemapIndexEntries(sitemaps: DataFrame, xmlCol: String): DataFrame =
    elementEntries(sitemaps, xmlCol, tag = "sitemap", outCol = "sitemap_url")

  /** Shared `<tag><loc>…</loc><lastmod>…</lastmod></tag>` element
    * parse for [[sitemapEntries]] / [[sitemapIndexEntries]]. Splits on
    * the close tag, keeps only chunks holding the exact OPEN tag
    * (`<url>` never matches `<urlset>`, `<sitemap>` never matches
    * `<sitemapindex>` — the `>` is the discriminator), and extracts
    * within the text AFTER the last open tag so preamble/declaration
    * text can never donate a field.
    */
  private def elementEntries(sitemaps: DataFrame, xmlCol: String,
      tag: String, outCol: String): DataFrame = {
    val keep = sitemaps.columns.filter(_ != xmlCol).map(col)
    val locRaw = regexp_extract(col("__chunk"),
      "(?s)<loc>\\s*(.*?)\\s*</loc>", 1)
    val loc = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&apos;" -> "'", "&amp;" -> "&") // &amp; LAST: "&amp;lt;" → "&lt;"
      .foldLeft(locRaw) { case (c, (e, ch)) => regexp_replace(c, e, ch) }
    sitemaps
      .select(keep :+
        explode(split(col(xmlCol), s"</$tag>")).as("__raw"): _*)
      .filter(instr(col("__raw"), s"<$tag>") > 0)
      .withColumn("__chunk", substring_index(col("__raw"), s"<$tag>", -1))
      .withColumn(outCol,
        when(loc === "", lit(null).cast("string")).otherwise(loc))
      .withColumn("lastmod", to_timestamp(
        when(regexp_extract(col("__chunk"),
          "<lastmod>\\s*([^<]*?)\\s*</lastmod>", 1) === "", lit(null))
          .otherwise(regexp_extract(col("__chunk"),
            "<lastmod>\\s*([^<]*?)\\s*</lastmod>", 1))))
      .filter(col(outCol).isNotNull)
      .drop("__raw", "__chunk")
  }

  /** The RE-CRAWL SCHEDULE — sitemap declarations diffed against what
    * the last crawl actually holds: per URL,
    *   - `new`      listed in the sitemap, never fetched;
    *   - `stale`    fetched, but the declared lastmod postdates the
    *                fetch — the publisher says it changed;
    *   - `fresh`    fetched at/after the declared lastmod (or no
    *                lastmod declared — nothing says it changed);
    *   - `unlisted` fetched but no longer in the sitemap (the
    *                candidate-gone set [[crawlDiff]] later confirms).
    *
    * `sitemap`: (url, lastmod timestamp-or-null) —
    * [[sitemapEntries]]' shape; `crawled`: (url, fetch time). Both
    * sides reduce to narrow (url, ts) relations before the full-outer
    * equi-join — at 100 TB this moves urls × ~16 bytes, the
    * [[crawlDiff]] bound. Feed the `new` ∪ `stale` set to
    * [[frontierSlots]] for the politeness-budgeted fetch order.
    */
  def recrawlSchedule(sitemap: DataFrame, crawled: DataFrame,
      urlCol: String = "url", lastmodCol: String = "lastmod",
      crawledUrlCol: String = "url", fetchTsCol: String = "fetch_ts")
      : DataFrame = {
    val sm = sitemap.select(col(urlCol).as("url"),
      col(lastmodCol).as("lastmod"), lit(true).as("__listed"))
    val cr = crawled.select(col(crawledUrlCol).as("url"),
      col(fetchTsCol).as("last_fetch"), lit(true).as("__fetched"))
    sm.join(cr, Seq("url"), "full_outer")
      .withColumn("verdict",
        when(col("__fetched").isNull, lit("new"))
          .when(col("__listed").isNull, lit("unlisted"))
          .when(col("lastmod") > col("last_fetch"), lit("stale"))
          .otherwise(lit("fresh")))
      .select(col("url"), col("verdict"), col("lastmod"), col("last_fetch"))
  }

  /** [[recrawlSchedule]] LIVE — the sitemap-driven re-crawl trigger
    * feed: sitemap entries arrive as a stream (e.g.
    * `readStream.text(..., wholetext)` through [[sitemapEntries]],
    * which is stateless — explode + regexp — and streams as-is) and
    * each declared URL is judged on arrival against the previous
    * crawl's broadcast (url, fetch time) relation: `new` / `stale` /
    * `fresh` per entry, stateless append mode, no watermark needed.
    * `unlisted` is inherently an end-of-inventory verdict and stays
    * with the batch [[recrawlSchedule]] — the same live/batch split
    * as [[crawlDiffStream]]'s missing `gone`. Identical expression
    * runs batch-side (spec-pinned twin).
    */
  def recrawlScheduleStream(sitemap: DataFrame, crawled: DataFrame,
      urlCol: String = "url", lastmodCol: String = "lastmod",
      crawledUrlCol: String = "url", fetchTsCol: String = "fetch_ts")
      : DataFrame =
    sitemap.select(col(urlCol).as("url"), col(lastmodCol).as("lastmod"))
      .join(broadcast(crawled.select(col(crawledUrlCol).as("url"),
        col(fetchTsCol).as("last_fetch"))), Seq("url"), "left")
      .withColumn("verdict",
        when(col("last_fetch").isNull, lit("new"))
          .when(col("lastmod") > col("last_fetch"), lit("stale"))
          .otherwise(lit("fresh")))
      .select(col("url"), col("verdict"), col("lastmod"), col("last_fetch"))

  /** The full Common Crawl WARC→WET job as one call: every `response`
    * record in `inDir`'s segments becomes a linked `conversion`
    * record ([[graft.sources.warc.Wet.convert]] — scan-fused
    * extraction, deterministic ids) written as WET segments to
    * `outDir`. No shuffle anywhere: segment bytes → extracted text →
    * segment bytes in one narrow pass per partition. `index = true`
    * additionally emits the per-record gzip-member CDX index the WARC
    * sink supports, making the WET output externally seekable
    * ([[graft.sources.warc.WarcRandomAccess]]) — the layout Common
    * Crawl publishes for its own WET segments.
    */
  def toWet(spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, compression: String = "gzip",
      index: Boolean = false, httpEnvelope: Boolean = false): Unit =
    graft.sources.warc.Wet
      .convert(spark.read.format("warc").load(inDir), httpEnvelope)
      .write.format("warc").option("compression", compression)
      .option("index", index.toString)
      .mode("append").save(outDir)

  /** Streaming twin: the SAME projection chain over
    * `spark.readStream.format("warc")` records, with a STATIC
    * pre-parsed rule set (a stream cannot parse its own robots
    * records into the broadcast side of the same query — refresh
    * rules batch-side, the static-dimension pattern every
    * stream-static enrichment uses). Fully stateless append-mode:
    * no aggregation, no watermark needed until downstream dedup.
    */
  def fromWarcStream(records: DataFrame, staticRules: DataFrame,
      s: CrawlSettings = CrawlSettings()): DataFrame = {
    val pages = htmlPages(records, s)
    val allowed =
      if (s.respectRobots)
        Robots.filterAllowedLit(pages, "target_uri", staticRules)
      else pages
    project(allowed, s)
  }
}

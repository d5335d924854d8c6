package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTTP/1.x response-envelope parsing over WARC payloads, plus the
  * redirect-graph resolution built on it.
  *
  * Common Crawl `response` records archive the FULL HTTP response —
  * status line, headers, blank line, body — as the record block
  * (ISO 28500 §6.3; the reference pipeline only ever sees pre-extracted
  * bodies, so this surface is the crawl-side superset a corpus builder
  * needs: status-class audits, redirect resolution, declared
  * content-type/charset).
  *
  * Scale shape: every accessor is a scan-fused projection over built-in
  * string expressions (split / regexp_extract / substring — all
  * whole-stage-codegen'd), zero UDFs, zero shuffles. The ONE encoding
  * subtlety: header bytes are ISO-8859-1 by RFC 9112, and ISO-8859-1 is
  * byte↔char BIJECTIVE, so `decode(payload, "ISO-8859-1")` →
  * split/slice → `encode(…, "ISO-8859-1")` round-trips the body bytes
  * exactly — binary-safe slicing with string built-ins, no custom
  * kernel needed.
  */
object Http {

  /** The whole payload as a latin-1 string — 1 char per byte, lossless. */
  private def latin1(payload: Column): Column = decode(payload, "ISO-8859-1")

  private def blank(c: Column): Column =
    when(c === "", lit(null).cast("string")).otherwise(c)

  /** Head section: everything before the first CRLFCRLF (bare-LF
    * tolerated — real crawls contain both framings). No blank line →
    * the whole payload is headers (truncated record; body is null).
    */
  private def headSection(s: Column): Column =
    try_element_at(split(s, "\\r?\\n\\r?\\n", 2), lit(1))

  private def bodySection(s: Column): Column =
    try_element_at(split(s, "\\r?\\n\\r?\\n", 2), lit(2))

  /** Status code from the status line, null when the payload does not
    * start with an HTTP/1.x status line (guards the whole parse: a
    * WARC `resource` record or truncated block yields nulls, never an
    * ANSI cast error on untrusted crawl bytes).
    */
  def statusCode(payload: Column): Column =
    blank(regexp_extract(latin1(payload), "^HTTP/[0-9.]+ ([0-9]{3})", 1))
      .cast("int")

  /** First value of `name` (case-insensitive, first-wins per RFC 9110
    * field-order semantics for singleton fields); null when absent.
    * Header NAMES are ASCII tokens so `Pattern.quote` + `(?i)` is
    * exact; values trim optional leading whitespace only.
    */
  def header(payload: Column, name: String): Column =
    blank(regexp_extract(headSection(latin1(payload)),
      "(?im)^" + java.util.regex.Pattern.quote(name) + ":[ \\t]*([^\\r\\n]*)",
      1))

  /** Body bytes after the first blank line — exact, binary-safe (the
    * latin-1 round trip). Null when no blank line exists (truncated).
    */
  def body(payload: Column): Column = {
    val b = bodySection(latin1(payload))
    when(b.isNotNull, encode(b, "ISO-8859-1"))
  }

  /** Declared media type: `Content-Type` up to the first `;`,
    * lower-cased and trimmed (`text/HTML; charset=x` → `text/html`).
    */
  def mediaType(payload: Column): Column = {
    val ct = header(payload, "Content-Type")
    when(ct.isNotNull, lower(trim(split_part(ct, lit(";"), lit(1)))))
  }

  /** Declared charset from the Content-Type parameters, lower-cased;
    * null when undeclared.
    */
  def charset(payload: Column): Column =
    blank(lower(regexp_extract(coalesce(header(payload, "Content-Type"),
      lit("")), "(?i)charset=\"?([A-Za-z0-9_\\-]+)", 1)))

  /** Charset sniffed from the body's own markup — `<meta charset=…>`
    * or the http-equiv form — for responses whose Content-Type
    * declares none (or lies by omission; the HTML5 prescan rule is
    * exactly this fallback). Read off the latin-1 view, so sniffing
    * never depends on the answer it produces.
    */
  def metaCharset(payload: Column): Column =
    blank(lower(regexp_extract(coalesce(bodySection(latin1(payload)),
      lit("")),
      "(?i)<meta[^>]*charset=[\"']?([A-Za-z0-9_\\-]+)", 1)))

  /** The charset that governs the body: declared in Content-Type
    * first (the HTTP layer wins per HTML5), else sniffed from the
    * markup; null when neither speaks (callers default to utf-8).
    */
  def effectiveCharset(payload: Column): Column =
    coalesce(charset(payload), metaCharset(payload))

  /** Body decoded as TEXT via the effective charset — utf-8 unless
    * the declared-or-sniffed charset is the latin-1 family (the two
    * families that cover the overwhelming share of the web; an
    * unrecognized declaration falls back to utf-8). One scan-fused
    * expression; [[CrawlPipeline]] and [[graft.sources.warc.Wet]]
    * share it so envelope decode can never drift between the two.
    */
  def decodedBody(payload: Column): Column = {
    val b = body(payload)
    when(effectiveCharset(payload)
        .isin("iso-8859-1", "latin1", "windows-1252"),
      decode(b, "ISO-8859-1")).otherwise(decode(b, "UTF-8"))
  }

  /** The envelope split as one projection: status, media_type,
    * charset, location (redirect target), body. `records` is the WARC
    * relation; every added column fuses into its scan.
    */
  def responseParts(records: DataFrame,
      payloadCol: String = "payload"): DataFrame = {
    val p = col(payloadCol)
    records
      .withColumn("status", statusCode(p))
      .withColumn("media_type", mediaType(p))
      .withColumn("charset", charset(p))
      .withColumn("location", header(p, "Location"))
      .withColumn("body", body(p))
  }

  /** The redirect graph: (url, next) for every 3xx response carrying a
    * Location header, collapsed to DISTINCT edges — a recrawl archive
    * fetches the same URL many times, and duplicate edge rows roughly
    * SQUARE per pointer-doubling round in [[resolveRedirects]], so
    * multiplicity must die here, at O(redirects) rows, not after a
    * self-join blew it up. With `dateCol` set the collapse is
    * latest-fetch-wins per URL (one partial-aggregable max(struct) —
    * a URL whose Location changed across crawls keeps only its
    * CURRENT target, making the hop map a function); without a date
    * column it is a plain distinct, so a URL with two historical
    * Locations keeps both edges. O(redirects) rows — a small fraction
    * of the crawl — and the body bytes never leave the scan.
    */
  def redirectEdges(records: DataFrame, urlCol: String = "target_uri",
      payloadCol: String = "payload",
      dateCol: Option[String] = None): DataFrame = {
    val p = col(payloadCol)
    val base = records.filter(col("record_type") === "response")
      .withColumn("__st", statusCode(p))
      .filter(col("__st") >= 300 && col("__st") <= 399)
      .withColumn("next", header(p, "Location"))
      .filter(col("next").isNotNull)
    dateCol match {
      case Some(d) => base
        .select(col(urlCol).as("url"),
          unix_timestamp(to_timestamp(col(d))).as("__t"), col("next"))
        .groupBy(col("url"))
        .agg(max(struct(col("__t"), col("next"))).as("__m"))
        .select(col("url"), col("__m.next").as("next"))
      case None =>
        base.select(col(urlCol).as("url"), col("next")).distinct()
    }
  }

  /** Resolve every redirect source to its final destination by POINTER
    * DOUBLING: composing the hop map with itself k times follows
    * chains up to 2^k hops in k self-joins — O(log chain) rounds, the
    * star-contraction discipline, instead of one join per hop. Each
    * round is one equi-join of two (url, next, hops) relations; at
    * 100 TB the relation is O(redirects), never O(pages).
    *
    * Output: (url, final_url, hops, resolved). `resolved` = the final
    * URL has no outgoing redirect — false means a cycle or a chain
    * longer than 2^maxDoublings (for cycles `hops` counts traversed
    * edges up to the cap, not a chain length). Deterministic and
    * partitioning-invariant, so an oracle replays the doubling rounds
    * as unrolled join layers.
    */
  def resolveRedirects(edges: DataFrame, maxDoublings: Int = 4): DataFrame = {
    require(maxDoublings >= 0, "maxDoublings must be >= 0")
    // defensive dedup: duplicate (url, next) rows — normal when the
    // caller hands raw per-fetch edges — roughly SQUARE in each
    // doubling self-join below (N copies of a hop join N copies of the
    // next hop), a row-count blowup plus duplicate output rows. One
    // distinct of the O(redirects) relation up front keeps every round
    // honest regardless of the edge source.
    var f = edges.select(col("url"), col("next")).distinct()
      .select(col("url"), col("next"), lit(1L).as("hops"))
    for (_ <- 1 to maxDoublings) {
      val g = f.select(col("url").as("g_url"), col("next").as("g_next"),
        col("hops").as("g_hops"))
      f = f.join(g, f("next") === g("g_url"), "left")
        .select(f("url"),
          coalesce(col("g_next"), f("next")).as("next"),
          (f("hops") + coalesce(col("g_hops"), lit(0L))).as("hops"))
    }
    val outs = edges.select(col("url").as("o_url")).distinct()
    f.join(outs, f("next") === col("o_url"), "left")
      .select(col("url"), col("next").as("final_url"), col("hops"),
        col("o_url").isNull.as("resolved"))
  }
}

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

  final case class CrawlSettings(
      agent: String = "*",
      respectRobots: Boolean = true,
      mainContentOnly: Boolean = true,
      minChars: Int = 25,
      linkNum: Int = 1, linkDen: Int = 5,
      stopNum: Int = 1, stopDen: Int = 10)

  private def hostOf(url: org.apache.spark.sql.Column) =
    lower(regexp_extract(url, "(?i)^https?://([^/:]+)", 1))

  private def isRobotsUrl(url: org.apache.spark.sql.Column) =
    url.rlike("(?i)^https?://[^/]+/robots\\.txt$")

  private def htmlPages(records: DataFrame): DataFrame =
    records.filter(col("record_type") === "response")
      .filter(!isRobotsUrl(col("target_uri")))
      .filter(coalesce(col("content_type"), lit("")).contains("html"))

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
    val doc = TextFunctions.htmlDoc(decode(col("payload"), "UTF-8"))
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
    val pages = htmlPages(records)
    val allowed =
      if (!s.respectRobots) pages
      else {
        val robots = records.filter(col("record_type") === "response")
          .filter(isRobotsUrl(col("target_uri")))
          .select(hostOf(col("target_uri")).as("host"),
            decode(col("payload"), "UTF-8").as("robots_text"))
        Robots.filterAllowed(pages, "target_uri",
          Robots.parseRules(robots, "host", "robots_text", s.agent))
      }
    project(allowed, s)
  }

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
    val pages = htmlPages(records)
    val allowed =
      if (s.respectRobots)
        Robots.filterAllowedLit(pages, "target_uri", staticRules)
      else pages
    project(allowed, s)
  }
}

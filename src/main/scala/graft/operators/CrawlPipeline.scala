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
  * Scale shape: robots bodies are O(hosts) and broadcast; every other
  * step is a narrow scan-fused projection except main-content's one
  * per-doc aggregate and the id-keyed join that re-attaches
  * url/title/ts to it.
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

  /** `records`: the WARC relation
    * (`spark.read.format("warc").load(dir)`). Returns
    * (doc_id, url, source, ts, title, text).
    */
  def fromWarc(records: DataFrame,
      s: CrawlSettings = CrawlSettings()): DataFrame = {
    val responses = records.filter(col("record_type") === "response")
    val pages = responses
      .filter(!col("target_uri").rlike("(?i)^https?://[^/]+/robots\\.txt$"))
      .filter(coalesce(col("content_type"), lit("")).contains("html"))
    val allowed =
      if (!s.respectRobots) pages
      else {
        val robots = responses
          .filter(col("target_uri").rlike("(?i)^https?://[^/]+/robots\\.txt$"))
          .select(hostOf(col("target_uri")).as("host"),
            decode(col("payload"), "UTF-8").as("robots_text"))
        Robots.filterAllowed(pages, "target_uri",
          Robots.parseRules(robots, "host", "robots_text", s.agent))
      }
    val base = allowed.select(
      xxhash64(col("record_id")).as("doc_id"),
      col("target_uri").as("url"),
      hostOf(col("target_uri")).as("source"),
      to_timestamp(col("warc_date")).as("ts"),
      TextFunctions.htmlTitle(decode(col("payload"), "UTF-8")).as("title"),
      decode(col("payload"), "UTF-8").as("html"))
    if (s.mainContentOnly)
      base.join(
        TextAnalysis.htmlMainContent(
          base.select(col("doc_id"), col("html")), "doc_id", "html",
          minChars = s.minChars, linkNum = s.linkNum, linkDen = s.linkDen,
          stopNum = s.stopNum, stopDen = s.stopDen)
          .select(col("doc_id"), col("main_text").as("text")),
        "doc_id")
        .drop("html")
    else base
      .withColumn("text", TextFunctions.htmlText(col("html")))
      .drop("html")
  }
}

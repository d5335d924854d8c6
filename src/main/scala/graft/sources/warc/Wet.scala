package graft.sources.warc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WET conversion — the Common Crawl text-extraction layout: every
  * `response` record becomes a `conversion` record whose payload is
  * the extracted plain text of the page, linked back to the source
  * record via `WARC-Refers-To`. `convert` is a pure narrow projection
  * (filter + the codegen'd [[graft.functions.HtmlExtract]] kernel + a
  * deterministic derived record id), so
  *
  * {{{
  *   Wet.convert(spark.read.format("warc").load(in))
  *     .write.format("warc").option("compression", "gzip").save(out)
  * }}}
  *
  * is the whole WARC→WET job: scan-fused extraction, one write, no
  * shuffle anywhere. Record ids are minted deterministically
  * (sha1 of the source id) rather than as random UUIDs so re-runs are
  * byte-stable — the reproducibility contract the rest of the engine
  * keeps (no RNG in any operator).
  */
object Wet {

  /** `httpEnvelope = true` for Common-Crawl-layout inputs whose
    * response payloads carry the full HTTP message: only parsed-status
    * 2xx html responses convert, the body slices out of the envelope
    * ([[graft.operators.Http.body]], binary-safe), and the declared
    * charset picks the decode — the same contract as
    * [[graft.operators.CrawlPipeline.CrawlSettings.httpEnvelope]].
    * Still one narrow scan-fused projection either way.
    */
  def convert(records: DataFrame, httpEnvelope: Boolean = false): DataFrame = {
    import graft.operators.Http
    val base = records.filter(col("record_type") === "response")
    val pages =
      if (!httpEnvelope) base
      else base
        .filter(Http.statusCode(col("payload")).between(200, 299))
        .filter(coalesce(Http.mediaType(col("payload")), lit(""))
          .contains("html"))
    val html =
      if (!httpEnvelope) decode(col("payload"), "UTF-8")
      else Http.decodedBody(col("payload"))
    pages.select(
      concat(lit("<urn:wet:"), sha1(col("record_id")), lit(">")).as("record_id"),
      lit("conversion").as("record_type"),
      col("target_uri"),
      col("warc_date"),
      lit("text/plain").as("content_type"),
      map(lit("WARC-Refers-To"), col("record_id")).as("headers"),
      encode(graft.functions.TextFunctions.htmlText(html), "UTF-8")
        .as("payload"))
  }
}

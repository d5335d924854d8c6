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
  def convert(records: DataFrame): DataFrame =
    records.filter(col("record_type") === "response")
      .select(
        concat(lit("<urn:wet:"), sha1(col("record_id")), lit(">")).as("record_id"),
        lit("conversion").as("record_type"),
        col("target_uri"),
        col("warc_date"),
        lit("text/plain").as("content_type"),
        map(lit("WARC-Refers-To"), col("record_id")).as("headers"),
        encode(graft.functions.TextFunctions.htmlText(
          decode(col("payload"), "UTF-8")), "UTF-8").as("payload"))
}

package graft.operators

import graft.model.{OsmModel, PoiSettings}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The TagInfo tag dimension — build-side of the POI classification join
  * (SURVEY.md §2: S2/S3 sources, F5 dimension filter, T1 per-key top-k).
  *
  * The reference fetches the top-100 values per configured key from the
  * TagInfo API sorted by `count_ways` desc (filter.py:239), drops
  * multi-values (`;`) and values not documented in the OSM wiki
  * (filter.py:241-247), and memoizes the result to `tags.json`
  * (filter.py:282-299). Here the same shape arrives as a small
  * DataFrame(key, value, count, in_wiki) and the source-side top-k is
  * re-expressed as a window rank.
  */
object TagDimension {

  /** F5 + key selection + per-key top-k (T1). The `count >
    * minOccurrences` threshold (F4's second operand, filter.py:176-180)
    * is applied at probe-build time in [[toPairs]] so the dimension keeps
    * the counts for inspection.
    */
  def prepare(dim: DataFrame, settings: PoiSettings, topK: Int = 100): DataFrame = {
    val f5 = dim
      .filter(!col("value").contains(";"))
      .filter(coalesce(col("in_wiki"), lit(true)))
      .filter(col("key").isin(settings.keys: _*))
    // T1: top-k per key by count desc (tie-broken on value for determinism)
    val w = Window.partitionBy(col("key")).orderBy(col("count").desc, col("value"))
    f5.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= topK)
      .drop("__rank")
  }

  /** S2/S3/C11 — load a dimension from the reference's `tags.json`
    * memo format `{retrieval_date, data: {key: {value: count}}}`
    * (filter.py:282-299). The nested dynamic keys parse as nested maps,
    * then unnest to the relational (key, value, count) shape. `in_wiki`
    * is true: the reference applies that filter before writing the memo
    * (filter.py:241-247).
    */
  def loadJson(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("retrieval_date", StringType),
      StructField("data", MapType(StringType, MapType(StringType, LongType)))))
    spark.read.text(path)
      .select(from_json(col("value"), schema).as("j"))
      .select(explode(col("j.data")).as(Seq("key", "values")))
      .select(col("key"), explode(col("values")).as(Seq("value", "count")))
      .withColumn("in_wiki", lit(true))
  }

  /** C11 completeness — parse a RAW TagInfo API envelope
    * `{data: [{value, count, in_wiki, ...}], ...}` as returned by
    * `/api/4/key/values` (filter.py:239-247), applying the reference's
    * retrieval-time filters: multi-values (`;`) and values without an
    * OSM wiki entry are dropped. The envelope does not name its key
    * (it lives in the request URL), so the caller supplies it — one
    * envelope file per key, exactly like the reference's one API call
    * per configured tag. Extra envelope fields (fraction, description,
    * paging) are ignored by the explicit schema. Produces the same
    * (key, value, count, in_wiki) shape as [[loadJson]], so a freshly
    * fetched TagInfo dump feeds [[prepare]] without pre-conversion.
    */
  private val envelopeSchema = StructType(Seq(
    StructField("data", ArrayType(StructType(Seq(
      StructField("value", StringType),
      StructField("count", LongType),
      StructField("in_wiki", BooleanType)))))))

  /** The shared envelope → (key, value, count, in_wiki) transform —
    * ONE implementation under both the fixture-file and live-HTTP
    * paths, so they cannot drift.
    */
  private def envelopeRows(parsed: DataFrame, key: String): DataFrame =
    parsed.select(explode(col("data")).as("d"))
      .filter(!col("d.value").contains(";") && col("d.in_wiki"))
      .select(lit(key).as("key"), col("d.value").as("value"),
        col("d.count").as("count"), col("d.in_wiki").as("in_wiki"))

  def loadApiEnvelope(spark: SparkSession, path: String, key: String): DataFrame =
    envelopeRows(
      spark.read.schema(envelopeSchema).option("multiLine", "true").json(path),
      key)

  /** S2-LIVE — fetch the dimension over REAL HTTP: one GET per key
    * against a TagInfo-shaped endpoint
    * (`{base}/api/4/key/values?key=K&page=1&rp=N&sortname=count_ways&sortorder=desc`
    * — the reference's exact request, filter.py:235-247), parsed
    * through the SAME envelope schema and retrieval-time filters as
    * [[loadApiEnvelope]]. Fetching runs DRIVER-side on JDK
    * `java.net.http.HttpClient` deliberately: the dimension is bounded
    * tiny by construction (≤ topK × |keys| rows), so a distributed
    * fetch would be pure overhead — the 100 TB side of this join is
    * the probe, never the dimension. The zero-egress container drives
    * this code path in tests against an in-JVM
    * `com.sun.net.httpserver` serving the checked-in fixture, so the
    * full network stack (socket, status handling, query string) runs.
    */
  def fetchApi(spark: SparkSession, baseUrl: String, keys: Seq[String],
      resultsPerPage: Int = 100,
      timeout: java.time.Duration = java.time.Duration.ofSeconds(30)): DataFrame = {
    require(keys.nonEmpty, "fetchApi needs at least one key")
    import spark.implicits._
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(timeout).build()
    keys.map { k =>
      val url = s"$baseUrl/api/4/key/values" +
        s"?key=${java.net.URLEncoder.encode(k, "UTF-8")}" +
        s"&page=1&rp=$resultsPerPage&sortname=count_ways&sortorder=desc"
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(timeout).GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() == 200,
        s"TagInfo GET $url returned HTTP ${resp.statusCode()}")
      envelopeRows(
        spark.read.schema(envelopeSchema).json(Seq(resp.body()).toDS()), k)
    }.reduce(_.unionByName(_))
  }

  /** K4 — persist a dimension back to the tags.json memo shape. */
  def saveJson(dim: DataFrame, path: String, retrievalDate: String): Unit = {
    val byKey = dim.groupBy(col("key"))
      .agg(map_from_entries(collect_list(struct(col("value"), col("count"))))
        .as("values"))
    val json = byKey
      .agg(map_from_entries(collect_list(struct(col("key"), col("values"))))
        .as("data"))
      .select(to_json(struct(lit(retrievalDate).as("retrieval_date"), col("data")))
        .as("j"))
    json.coalesce(1).write.mode("overwrite").text(path)
  }

  /** A1 — rebuild the tag-usage dimension from raw tagged objects:
    * `count(*) GROUP BY key, value` over exploded tag maps (the
    * reference consumes this pre-aggregated from the TagInfo service;
    * SURVEY.md §2.5 A1). Hash aggregate, partial+final.
    */
  def fromTaggedObjects(objs: DataFrame): DataFrame =
    objs.select(explode(col("tags")).as(Seq("key", "value")))
      .groupBy(col("key"), col("value"))
      .agg(count(lit(1)).as("count"))

  /** Collapse the (tiny, bounded) dimension to the in-plan probe set for
    * [[graft.functions.TagsAnyMatch]]. The collect here is the broadcast:
    * the dimension is ≤ topK × |keys| rows by construction.
    */
  def toPairs(dim: DataFrame, settings: PoiSettings): Seq[(String, String)] =
    dim.filter(col("count") > settings.minOccurrences)
      .select(col("key"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq
      .sorted
}

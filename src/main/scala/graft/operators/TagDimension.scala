package graft.operators

import graft.model.PoiSettings
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

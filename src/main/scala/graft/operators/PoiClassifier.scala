package graft.operators

import graft.functions.TagMatch
import graft.model.PoiSettings
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The POI classifier — predicates F1–F4 and join J1 of SURVEY.md §2.3/2.4
  * (reference: `FilterHandler._filter`, filter.py:158-211) as a pure
  * `DataFrame => DataFrame` transform.
  *
  * The whole chain compiles to ONE narrow, shuffle-free, whole-stage-
  * codegen'd stage per input table: parquet scan → fused conjunctive
  * filter → downstream projection. The classifying dimension rides inside
  * the plan (see [[graft.functions.TagsAnyMatch]]), which is the
  * broadcast-hash-join shape Catalyst would pick for a ≤800-row build
  * side, minus the explode/dedup the relational encoding would need.
  */
object PoiClassifier {

  /** F1 — drop objects with an empty tag bag (filter.py:164-166). */
  def hasTags(tags: Column): Column = size(tags) > 0

  /** F2 — drop objects without a `name` tag when configured
    * (filter.py:167-169, `SKIP_NO_NAME` settings_default.py:27).
    */
  def hasName(tags: Column): Column = tags.getItem("name").isNotNull

  /** F3 — exclusion-combo anti-filter (filter.py:170-173): drop the
    * object if its tag set, viewed as "key=value" strings, is a superset
    * of any configured exclusion tuple. Expressed with static literals so
    * each tuple folds into codegen'd `array_contains` conjunctions.
    */
  def matchesExclusion(tags: Column, excludeList: Seq[Seq[String]]): Column = {
    val tagStrings = transform(map_entries(tags),
      e => concat(e.getField("key"), lit("="), e.getField("value")))
    excludeList
      .map(tuple => tuple.map(t => array_contains(tagStrings, t)).reduce(_ && _))
      .reduce(_ || _)
  }

  /** F1 → F2 → F3 → F4 classification chain; Catalyst keeps the
    * cheapest-first short-circuit the reference hand-codes with early
    * returns (filter.py:164-180, SURVEY.md §4).
    *
    * @param objs     nodes- or ways-shaped DataFrame with a `tags` map
    * @param dimPairs classifying (key, value) pairs from
    *                 [[TagDimension.toPairs]]
    */
  def classify(objs: DataFrame, dimPairs: Seq[(String, String)],
      settings: PoiSettings): DataFrame = {
    var df = objs.filter(hasTags(col("tags")))
    if (settings.skipNoName) df = df.filter(hasName(col("tags")))
    if (settings.excludeList.nonEmpty)
      df = df.filter(!matchesExclusion(col("tags"), settings.excludeList))
    df.filter(TagMatch.tagsAnyMatch(col("tags"), dimPairs))
  }

  /** The same J1 semantics in pure relational form — explode the tag map
    * and broadcast-LEFT-SEMI-join against the dimension DataFrame, then
    * semi-join the survivors' ids back. Costs two extra shuffles versus
    * [[classify]] (documented trade-off; kept as a cross-check and for
    * dimensions too large to ship in-plan).
    */
  def classifyRelational(objs: DataFrame, dim: DataFrame,
      settings: PoiSettings): DataFrame = {
    var df = objs.filter(hasTags(col("tags")))
    if (settings.skipNoName) df = df.filter(hasName(col("tags")))
    if (settings.excludeList.nonEmpty)
      df = df.filter(!matchesExclusion(col("tags"), settings.excludeList))
    val dimF = dim.filter(col("count") > settings.minOccurrences)
      .select(col("key"), col("value"))
    val hitIds = df
      .select(col("id"), explode(col("tags")).as(Seq("key", "value")))
      .join(broadcast(dimF), Seq("key", "value"), "left_semi")
      .select(col("id"))
    df.join(hitIds, Seq("id"), "left_semi")
  }
}

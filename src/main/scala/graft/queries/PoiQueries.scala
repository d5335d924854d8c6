package graft.queries

import graft.queries.Catalog.OrderByOnce
import graft.model.PoiSettings
import graft.operators.{PoiClassifier, TagDimension}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries for the reference's classification chain
  * (F1–F4, F5, J1 — SURVEY.md §2.3/2.4) over the OSM-shaped derivation
  * of the harness testdata ([[Tables.osmNodes]]).
  *
  * Each oracle encodes the classifying dimension
  * ([[Tables.classificationDim]]) as a static SQL predicate: the pairs
  * that survive F5 + the MIN_OCCURENCES threshold are exactly
  * (orderstatus→F, orderstatus→P, priority→1-URGENT).
  */
object PoiQueries {

  /** Shared by SparkEntry.entry and every classification query. */
  val baseSettings: PoiSettings = PoiSettings(
    keys = Seq("orderstatus", "priority", "name"),
    minOccurrences = 1000L)

  private val hitPredicate =
    "(o_orderstatus IN ('F', 'P') OR o_orderpriority = '1-URGENT')"

  private def classified(spark: SparkSession, sfDir: String,
      settings: PoiSettings): DataFrame = {
    val dim = TagDimension.prepare(Tables.classificationDimDf(spark), settings)
    val pairs = TagDimension.toPairs(dim, settings)
    PoiClassifier.classify(Tables.osmNodes(spark, sfDir), pairs, settings)
  }

  // orderByOnce: the classify tail (tag-match kernel over the scan) sat
  // in the sort sampler's re-executed segment — 6.95 -> 3.87 s at sf10g
  // for the exclude form; the relational form is flat-within-noise
  private def projectIds(df: DataFrame): DataFrame =
    df.select(
      col("id"),
      element_at(col("tags"), "orderstatus").as("orderstatus"),
      element_at(col("tags"), "priority").as("priority"))
      .orderByOnce(col("id"))

  private def oracle(extraWhere: String): String =
    s"""SELECT o_orderkey AS id,
       |       o_orderstatus AS orderstatus,
       |       o_orderpriority AS priority
       |FROM orders
       |WHERE $hitPredicate$extraWhere
       |ORDER BY id""".stripMargin

  val all: Seq[Q] = Seq(

    Q("poi_classify_basic",
      (s, dir) => projectIds(classified(s, dir, baseSettings)),
      Some(oracle("")),
      doc = "F1+F4+J1+F5+T1: classification via in-plan broadcast tag probe"),

    Q("poi_classify_noname",
      (s, dir) => projectIds(classified(s, dir, baseSettings.copy(skipNoName = true))),
      Some(oracle("\n  AND o_totalprice > 200000")),
      doc = "F2: SKIP_NO_NAME drops objects without a name tag"),

    Q("poi_classify_exclude",
      (s, dir) => projectIds(classified(s, dir,
        baseSettings.copy(excludeList = Seq(Seq("orderstatus=F", "priority=1-URGENT"))))),
      Some(oracle("\n  AND NOT (o_orderstatus = 'F' AND o_orderpriority = '1-URGENT')")),
      doc = "F3: exclusion-combo superset anti-filter"),

    Q("poi_classify_relational",
      (s, dir) => {
        val dim = TagDimension.prepare(Tables.classificationDimDf(s), baseSettings)
        projectIds(PoiClassifier.classifyRelational(
          Tables.osmNodes(s, dir), dim, baseSettings))
      },
      Some(oracle("")),
      doc = "J1 cross-check: explode + broadcast left-semi relational path"),

    Q("tag_value_counts",
      (s, dir) => TagDimension.fromTaggedObjects(Tables.osmNodes(s, dir))
        .filter(col("key") =!= "name") // name values are per-row-unique noise
        .orderBy(col("key"), col("value")),
      Some("""SELECT * FROM (
             |  SELECT 'orderstatus' AS key, o_orderstatus AS value, count(*) AS count
             |  FROM orders GROUP BY o_orderstatus
             |  UNION ALL
             |  SELECT 'priority' AS key, o_orderpriority AS value, count(*) AS count
             |  FROM orders GROUP BY o_orderpriority)
             |ORDER BY key, value""".stripMargin),
      doc = "A1: rebuild tag-usage dimension from raw objects (explode + hash agg)")
  )
}

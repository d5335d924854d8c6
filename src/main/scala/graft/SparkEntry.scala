package graft

import graft.model.PoiSettings
import graft.operators.{PoiClassifier, TagDimension}
import graft.queries.Catalog
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see SURVEY.md §7 and the builder prompt. */
object SparkEntry {

  /** Flagship pipeline on sf0.001: the reference's main ETL
    * (filter.py:272-302) end-to-end — tag-dimension prepare (F5/T1) →
    * classify (F1–F4/J1) → project ids. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val settings = graft.queries.PoiQueries.baseSettings
    val dim = TagDimension.prepare(Tables.classificationDimDf(spark), settings)
    val pairs = TagDimension.toPairs(dim, settings)
    PoiClassifier.classify(Tables.osmNodes(spark, sfDir), pairs, settings)
      .select(col("id"), col("tags"))
      .orderBy(col("id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Catalog.queries

  /** DuckDB oracle twins; keys subset of `queries`. */
  def oracleSql: Map[String, String] = Catalog.oracleSql
}

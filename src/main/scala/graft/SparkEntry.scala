package graft

import graft.model.PoiSettings
import graft.operators.{PoiClassifier, TagDimension}
import graft.queries.Catalog
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see SURVEY.md §7 and the builder prompt. */
object SparkEntry {

  /** Flagship pipeline on sf0.001: the reference's FULL ETL
    * (filter.py:272-302 + ways_to_centroids.sql) end-to-end — dimension
    * prepare (F5/T1), node+way classification (F1–F4/J1), Osmosis
    * projection with WKB geometry (C3–C6/F9), centroid post-process
    * (F8/C8/C9/C10) and union-append (U1). Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val settings = graft.queries.PoiQueries.baseSettings.copy(
      keys = Seq("orderstatus", "priority", "name", "parttype", "brand"))
    val result = graft.operators.PoiPipeline.run(
      Tables.osmNodes(spark, sfDir),
      Tables.osmWays(spark, sfDir),
      Tables.classificationDimDf(spark),
      settings)
    result.nodesWithCentroids.orderBy(col("id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Catalog.queries

  /** DuckDB oracle twins; keys subset of `queries`. */
  def oracleSql: Map[String, String] = Catalog.oracleSql
}

package graft.operators

import graft.model.{OsmModel, PoiSettings}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's full ETL as one composable transform — what
  * `filter.py OSMFILE` + `ways_to_centroids.sql` produce together
  * (SURVEY.md §3.1/§3.3): classify nodes and ways against the tag
  * dimension, project to Osmosis rows with WKB geometry, collapse small
  * ways to centroid nodes, and append them into the nodes relation.
  *
  * A user of the reference points this at their nodes/ways/dimension
  * tables instead of running the Python script + SQL file; sinks
  * ([[graft.sinks.PoiSink]]) then write parquet or JDBC.
  */
object PoiPipeline {

  final case class Result(nodes: DataFrame, ways: DataFrame,
      nodesWithCentroids: DataFrame, invalidWays: DataFrame)

  /** @param nodes OSM-nodes-shaped input ([[graft.model.OsmModel.nodesSchema]])
    * @param ways  OSM-ways-shaped input with assembled rings
    * @param dim   raw TagInfo dimension (key, value, count, in_wiki)
    */
  def run(nodes: DataFrame, ways: DataFrame, dim: DataFrame,
      settings: PoiSettings = PoiSettings()): Result = {
    val prepared = TagDimension.prepare(dim, settings)
    val pairs = TagDimension.toPairs(prepared, settings)

    // A2 — progress instrumentation: the reference logs a line per 1M
    // objects evaluated (filter.py:213-228); the declarative analog is
    // an Observation-style metric riding the existing pass (no extra
    // job). Read them from a QueryExecutionListener or
    // df.observe-returned Observation.
    val poiNodes = PoiProjector.projectNodes(
      PoiClassifier.classify(nodes, pairs, settings), settings)
      .observe("poi_nodes", count(lit(1)).as("rows_kept"))

    if (settings.skipWays) {
      val emptyWays = PoiProjector.projectWays(ways.limit(0), settings)
      Result(poiNodes, emptyWays, poiNodes, emptyWays)
    } else {
      val classifiedWays = PoiClassifier.classify(ways, pairs, settings)
      val (poiWays, invalidWays) =
        PoiProjector.splitInvalid(PoiProjector.projectWays(classifiedWays, settings))
      // ways_to_centroids.sql post-process over the projected ways
      // relation: trim applies to its tags too (F9 happens at project)
      val trimmedWays =
        if (settings.trimTags.isEmpty) classifiedWays
        else classifiedWays.withColumn("tags", map_filter(col("tags"),
          (k, _) => !k.isin(settings.trimTags.map(x => x: Any): _*)))
      val centroids = WaysToCentroids.centroidRows(
        trimmedWays, OsmModel.CentroidAreaThreshold)
      Result(poiNodes, poiWays,
        WaysToCentroids.appendToNodes(poiNodes, centroids), invalidWays)
    }
  }
}

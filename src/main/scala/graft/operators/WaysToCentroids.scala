package graft.operators

import graft.functions.GeoFunctions
import graft.model.OsmModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's post-processing query (ways_to_centroids.sql:1-6;
  * SURVEY.md §3.3): small polygons collapse to centroid "nodes".
  *
  *   WITH la AS (
  *     SELECT id + 36000000000, version, user_id, tstamp, changeset_id,
  *            tags, ST_Centroid(linestring) geom
  *     FROM ways WHERE ST_Area(linestring::geography) <= 20000)
  *   INSERT INTO nodes SELECT * FROM la;
  *
  * Expressed as two pure transforms: [[centroidRows]] (F8 filter + C8
  * centroid + C10 id offset) and [[appendToNodes]] (U1 union / K5
  * append). Catalyst pushes the area filter below the projection; the
  * whole thing is a single narrow stage over the ways scan.
  */
object WaysToCentroids {

  /** F8 + C8 + C10: ways with geodesic area ≤ threshold (m²) become
    * centroid node rows with the +36e9 id offset keeping the id space
    * disjoint from real nodes (README.md:50). `spheroid = true` applies
    * the threshold to the authalic (PostGIS-geography-grade) area, so
    * polygons near the 20,000 m² boundary classify as the reference
    * does; the spherical default is ~0.1–0.5% off but cheaper.
    *
    * PostGIS-parity bound (round 15, pinned by EllipsoidSpec against
    * [[graft.functions.Ellipsoid.polygonAreaM2]], the exact
    * GeographicLib-semantics area): the authalic area follows the
    * measured SIZE LAW rel ≲ 1e-5 + tan(φ)·Δφ/4 against the true
    * ellipsoidal value (EllipsoidProperties) — ~2e-7 on axis-aligned
    * ways, ~2e-6 on diagonal THRESHOLD-BAND quads (the ≤ 20,000 m²
    * polygons this operator classifies are ~140 m across, where the
    * law is comfortably under 1e-5) — so `spheroid = true` can
    * classify a polygon differently from PostGIS only when its true
    * area lies within ±0.2 m² of the 20,000 m² threshold: a
    * quantified flip band, not an open residual. For an audit of exactly those rows,
    * re-filter the boundary band with
    * [[graft.functions.GeoFunctions.geodesic_area_ellipsoid]] (the
    * `way_area_ellipsoid_exact` catalog query pins the law on data).
    */
  def centroidRows(ways: DataFrame,
      areaThresholdM2: Double = OsmModel.CentroidAreaThreshold,
      spheroid: Boolean = false): DataFrame =
    ways
      .filter((if (spheroid) GeoFunctions.geodesic_area_spheroid(col("ring"))
        else GeoFunctions.geodesic_area(col("ring"))) <= areaThresholdM2)
      .select(
        (col("id") + OsmModel.CentroidIdOffset).as("id"),
        col("version"), col("user_id"), col("tstamp"), col("changeset_id"),
        col("tags"),
        GeoFunctions.centroid_wkb(col("ring")).as("geom"))

  /** U1/K5 — append the derived rows into the nodes relation (positional
    * column match in the reference; by-name here).
    */
  def appendToNodes(nodes: DataFrame, centroids: DataFrame): DataFrame =
    nodes.unionByName(centroids)
}

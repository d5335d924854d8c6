package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J2/X2 — way-geometry assembly from node locations (SURVEY.md §2.4
  * J2, §2.10 X2).
  *
  * The reference keeps every node's location in an in-process osmium
  * cache (`locations=True`, filter.py:259-263) and resolves each way's
  * ordered node refs against it — semantically the join
  * `ways.nodes[] ⋈ nodes.id` preserving `sequence_id` order
  * (materialized form: `way_nodes`, schema.sql:170-177; the plpgsql
  * UNNEST helper is schema.sql:66-82).
  *
  * At scale this is a big-big equi-join: explode the refs (narrow —
  * (way_id, pos, node_id) only), shuffle-join on node_id (Catalyst
  * picks sort-merge; AQE converts to broadcast when the node side is
  * small), then reassemble per way with `sort_array(collect_list)` —
  * one shuffle for the join, one for the regroup, no driver state.
  * osmium's spill-to-disk index knob (`dense_mmap_array`) becomes
  * Spark's shuffle-spill machinery for free.
  */
object WayAssembly {

  /** X2 — UNNEST of the node-ref array (one row per (way, seq, node)). */
  def wayNodes(ways: DataFrame): DataFrame =
    ways.select(col("id").as("way_id"),
      posexplode(col("nodes")).as(Seq("pos", "node_id")))

  /** J2 — assemble each way's ordered (lon, lat) ring from a
    * node-location relation `nodeLocations(node_id, lon, lat)`.
    * Output: (id, ring array<struct<lon,lat>>).
    */
  def assembleRings(ways: DataFrame, nodeLocations: DataFrame): DataFrame =
    wayNodes(ways)
      .join(nodeLocations, "node_id")
      .groupBy(col("way_id").as("id"))
      .agg(transform(
        sort_array(collect_list(struct(col("pos"), col("lon"), col("lat")))),
        e => struct(e.getField("lon").as("lon"), e.getField("lat").as("lat")))
        .as("ring"))
}

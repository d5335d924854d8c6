package graft.sinks

import graft.functions.GeoFunctions
import graft.operators.{RelationAssembly, WayAssembly}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The Osmosis pgsnapshot 7-table layout (reference schema.sql:95-198:
  * `nodes`, `ways`, `way_nodes`, `relations`, `relation_members`,
  * `users`, `schema_info`) materialized from the source row shapes —
  * what a COPY into PostGIS would contain, as parquet directories.
  *
  * Scale notes: every table is a narrow projection or posexplode of an
  * input — no joins, no driver state; `users` is a distinct over
  * (user_id, user_name), a tiny aggregation. Each table writes
  * independently, so a 100 TB run parallelizes per table and per
  * partition.
  */
object PgSnapshotLayout {

  /** pgsnapshot schema version the Osmosis 0.48 DDL line carries. */
  val SchemaVersion = 6

  private def pgCommon(df: DataFrame) =
    Seq(col("id"), col("version"), col("user_id"), col("tstamp"),
      col("changeset_id"), col("tags")).map(c => c)

  /** Write all seven tables under `outDir/<table>`. Inputs use the
    * source schemas ([[graft.model.OsmModel]]); ways may carry an
    * assembled `ring` (adds `linestring` WKB, schema.sql:194) or not
    * (linestring null).
    */
  def write(nodes: DataFrame, ways: DataFrame, relations: DataFrame,
      outDir: String): Unit = {
    val spark = nodes.sparkSession

    nodes.select(pgCommon(nodes) :+
        GeoFunctions.wkb_point(col("lon"), col("lat")).as("geom"): _*)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/nodes")

    val hasRing = ways.columns.contains("ring")
    val linestring =
      if (hasRing) GeoFunctions.wkb_linestring(col("ring")) else lit(null)
    ways.select(pgCommon(ways) :+ col("nodes") :+
        linestring.cast("binary").as("linestring"): _*)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/ways")

    WayAssembly.wayNodes(ways)
      .select(col("way_id"), col("node_id"), col("pos").as("sequence_id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/way_nodes")

    relations.select(pgCommon(relations): _*)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/relations")

    RelationAssembly.relationMembers(relations)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/relation_members")

    // users = the normalization of (user_id, user_name) across every
    // entity kind (schema.sql:158-162); Osmosis keeps the highest-id
    // name on conflicts — a max_by aggregation here
    Seq(nodes, ways, relations)
      .map(_.select(col("user_id"), col("user_name"), col("id")))
      .reduce(_ unionByName _)
      .filter(col("user_id").isNotNull && col("user_name").isNotNull)
      .groupBy(col("user_id").as("id"))
      .agg(max_by(col("user_name"), col("id")).as("name"))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/users")

    import spark.implicits._
    Seq(SchemaVersion).toDF("version")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/schema_info")
  }
}

package graft.model

import org.apache.spark.sql.types._

/** Data model of the engine — the Osmosis "pgsnapshot" row shapes the
  * reference targets (reference: schema.sql:95-103 `nodes`,
  * schema.sql:186-195 `ways`) re-expressed as Spark `StructType`s.
  *
  * Tags are kept as a native `MapType(String, String)` end-to-end (the
  * reference serializes them to an hstore text literal immediately,
  * filter.py:102-111; we only do that in the optional compat formatter —
  * see [[graft.functions.HstoreCompat]]). Geometry is WKB bytes with the
  * SRID-4326 convention (reference: schema.sql:102,194).
  */
object OsmModel {

  /** `public.nodes` (schema.sql:95-103) with geometry decomposed into
    * lon/lat doubles on the input side; the WKB `geom` column is derived
    * by [[graft.functions.GeoFunctions.wkb_point]] (C3).
    */
  /** Source rows also carry `user_name` (the pgsnapshot `users` table
    * is its normalization, schema.sql:152-159) and the OSM `visible`
    * flag (absent in data extracts → true; PBF DenseInfo field 6) —
    * the pgsnapshot projection drops both, the layout writer
    * ([[graft.sinks.PgSnapshotLayout]]) extracts `users` from them.
    */
  val nodesSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("version", IntegerType, nullable = true),
    StructField("user_id", IntegerType, nullable = true),
    StructField("tstamp", TimestampType, nullable = true),
    StructField("changeset_id", LongType, nullable = true),
    StructField("tags", MapType(StringType, StringType, valueContainsNull = false), nullable = true),
    StructField("lon", DoubleType, nullable = true),
    StructField("lat", DoubleType, nullable = true),
    StructField("user_name", StringType, nullable = true),
    StructField("visible", BooleanType, nullable = true)
  ))

  /** `public.ways` (schema.sql:186-195): ordered node refs as
    * `bigint[]` → ArrayType(LongType); the assembled exterior ring (the
    * result of the J2 way⋈node join, filter.py:259-263) as an array of
    * (lon, lat) structs feeding the area/centroid functions (C4/C8/C9).
    */
  val waysSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("version", IntegerType, nullable = true),
    StructField("user_id", IntegerType, nullable = true),
    StructField("tstamp", TimestampType, nullable = true),
    StructField("changeset_id", LongType, nullable = true),
    StructField("tags", MapType(StringType, StringType, valueContainsNull = false), nullable = true),
    StructField("nodes", ArrayType(LongType, containsNull = false), nullable = true),
    StructField("ring", ArrayType(StructType(Seq(
      StructField("lon", DoubleType, nullable = false),
      StructField("lat", DoubleType, nullable = false))), containsNull = false), nullable = true),
    StructField("user_name", StringType, nullable = true),
    StructField("visible", BooleanType, nullable = true)
  ))

  /** `public.relations` + `public.relation_members`
    * (schema.sql:130-138, 112-122) fused into one row shape: the
    * ordered member list rides along as an array (sequence_id =
    * position), exactly like way node refs; the normalized
    * `relation_members` relation is derived by
    * [[graft.operators.RelationAssembly.relationMembers]] (posexplode),
    * mirroring X2. `member_type` uses Osmosis's single characters
    * N/W/R (schema.sql:116 `character(1)`).
    */
  val relationsSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("version", IntegerType, nullable = true),
    StructField("user_id", IntegerType, nullable = true),
    StructField("tstamp", TimestampType, nullable = true),
    StructField("changeset_id", LongType, nullable = true),
    StructField("tags", MapType(StringType, StringType, valueContainsNull = false), nullable = true),
    StructField("members", ArrayType(StructType(Seq(
      StructField("member_type", StringType, nullable = false),
      StructField("member_id", LongType, nullable = false),
      StructField("member_role", StringType, nullable = false))), containsNull = false),
      nullable = true),
    StructField("user_name", StringType, nullable = true),
    StructField("visible", BooleanType, nullable = true)
  ))

  /** The TagInfo dimension (reference: tags.json shape, filter.py:291-299;
    * one row per (key, value) with the usage count and wiki flag consumed
    * by predicate F5, filter.py:241-247).
    */
  val tagDimSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("in_wiki", BooleanType, nullable = true)
  ))

  /** Id-space offset for way-derived centroid rows appended into the
    * nodes table (reference: ways_to_centroids.sql:2, README.md:50).
    */
  val CentroidIdOffset: Long = 36000000000L

  /** Geodesic-area threshold (m²) under which a way collapses to a
    * centroid node (reference: ways_to_centroids.sql:4).
    */
  val CentroidAreaThreshold: Double = 20000.0
}

/** Engine configuration mirroring the reference's `settings_default.py`.
  *
  * @param keys            root tag keys of interest (settings_default.py:5-14)
  * @param minOccurrences  global usage-count threshold for a (key, value)
  *                        to classify (settings_default.py:17, filter.py:176-180)
  * @param skipWays        ignore ways/areas entirely (settings_default.py:23)
  * @param skipNoName      drop objects without a `name` tag (settings_default.py:27)
  * @param trimTags        keys stripped from the tag bag before output
  *                        (settings_default.py:32, filter.py:109)
  * @param excludeList     "key=value" combos; an object whose tag set is a
  *                        superset of any combo is dropped
  *                        (settings_default.py:38, filter.py:170-173)
  * @param writeAfter      sink micro-batch size (settings_default.py:50)
  */
final case class PoiSettings(
    keys: Seq[String] = Seq("leisure", "shop", "amenity", "tourism",
      "craft", "healthcare", "office", "sport"),
    minOccurrences: Long = 1000L,
    skipWays: Boolean = false,
    skipNoName: Boolean = false,
    trimTags: Seq[String] = Nil,
    excludeList: Seq[Seq[String]] = Nil,
    writeAfter: Int = 10000)

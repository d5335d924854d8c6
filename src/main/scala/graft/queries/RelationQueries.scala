package graft.queries

import graft.functions.GeoFunctions
import graft.operators.RelationAssembly
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Oracle-checked queries for the relation surface (SURVEY.md §2.4 J3:
  * `relations` / `relation_members`, schema.sql:105-138, and the
  * multipolygon assembly the reference receives through osmium's area
  * callback, filter.py:227-232) over the [[Tables.osmRelations]]
  * derivation: each relation's outer square arrives SPLIT into two open
  * member ways (ring stitching is exercised for every row), and every
  * 10th part also carries a closed inner ring — a hole — so assembled
  * area has the closed form outer − inner.
  */
object RelationQueries {

  /** The relation parameters as SQL, mirroring [[Tables.osmRelations]]. */
  private val relSql =
    """(SELECT p_partkey AS id,
      |        CASE WHEN p_size <= 25 THEN 0.001 ELSE 0.1 END AS d,
      |        (p_retailprice % 300) - 150 AS lon0,
      |        (p_partkey % 120) - 60 AS lat0,
      |        p_partkey % 10 = 0 AS has_inner
      | FROM part WHERE p_partkey % 5 = 0) r""".stripMargin

  val all: Seq[Q] = Seq(

    Q("rel_members_explode",
      (s, dir) => RelationAssembly.relationMembers(Tables.osmRelations(s, dir))
        .orderBy(col("relation_id"), col("sequence_id")),
      Some("""SELECT id AS relation_id, CAST(seq AS INTEGER) AS sequence_id,
             |       'W' AS member_type,
             |       CASE seq WHEN 0 THEN id + 5000000
             |                WHEN 1 THEN id + 7000000
             |                ELSE id + 6000000 END AS member_id,
             |       CASE WHEN seq = 2 THEN 'inner' ELSE 'outer' END AS member_role
             |FROM (SELECT p_partkey AS id,
             |             unnest(generate_series(0, CASE WHEN p_partkey % 10 = 0
             |                                           THEN 2 ELSE 1 END)) AS seq
             |      FROM part WHERE p_partkey % 5 = 0)
             |ORDER BY relation_id, sequence_id""".stripMargin),
      doc = "J3/X2: pgsnapshot relation_members via posexplode (sequence_id = position)"),

    Q("multipolygon_assembly",
      (s, dir) => {
        val mp = RelationAssembly.assembleMultipolygons(
          Tables.osmRelations(s, dir), Tables.osmRelationWays(s, dir))
        mp.select(col("id"),
            size(col("outers")).as("n_outer"),
            size(col("inners")).as("n_inner"),
            size(element_at(col("outers"), 1)).as("outer_pts"),
            // C4 with holes: one polygon, exterior + interior rings;
            // the byte length has the closed form 22 + Σ(4 + 16·pts)
            length(GeoFunctions.wkb_multipolygon_rings(
              concat(slice(col("outers"), 1, 1), col("inners")))).as("wkb_bytes"),
            round(
              GeoFunctions.geodesic_area(element_at(col("outers"), 1)) -
                aggregate(col("inners"), lit(0.0),
                  (acc, ring) => acc + GeoFunctions.geodesic_area(ring)),
              1).as("area_m2"))
          .orderBy(col("id"))
      },
      Some(s"""SELECT id, 1 AS n_outer,
              |       CASE WHEN has_inner THEN 1 ELSE 0 END AS n_inner,
              |       5 AS outer_pts,
              |       CAST(22 + (4 + 16 * 5)
              |            + CASE WHEN has_inner THEN 4 + 16 * 5 ELSE 0 END
              |            AS INTEGER) AS wkb_bytes,
              |       round(abs(radians(d) * (2 + 2 * sin(radians(lat0)))
              |               - radians(d) * (2 + 2 * sin(radians(lat0 + d))))
              |             * 6378137.0 * 6378137.0 / 2
              |           - CASE WHEN has_inner THEN
              |               abs(radians(d / 2) * (2 + 2 * sin(radians(lat0 + d / 4)))
              |                 - radians(d / 2) * (2 + 2 * sin(radians(lat0 + d / 4 + d / 2))))
              |               * 6378137.0 * 6378137.0 / 2
              |             ELSE 0 END, 1) AS area_m2
              |FROM $relSql
              |ORDER BY id""".stripMargin),
      doc = "J3+C4+C9: stitch split outer ways into a ring, WKB with holes, subtract hole areas"),

    Q("way_linestring",
      (s, dir) => {
        val wp = Tables.osmRelationWays(s, dir)
        val segs = zip_with(
          slice(col("path"), lit(1), size(col("path")) - 1),
          slice(col("path"), lit(2), size(col("path")) - 1),
          (a, b) => sqrt(
            pow(b.getField("lon") - a.getField("lon"), 2) +
              pow(b.getField("lat") - a.getField("lat"), 2)))
        wp.select(col("way_id"),
            size(col("path")).as("n_pts"),
            (element_at(col("path"), 1) === element_at(col("path"), -1))
              .cast("int").as("closed"),
            length(GeoFunctions.wkb_linestring(col("path"))).as("wkb_bytes"),
            round(aggregate(segs, lit(0.0), (acc, x) => acc + x), 6).as("len_deg"))
          .orderBy(col("way_id"))
      },
      Some(s"""SELECT CASE seq WHEN 0 THEN id + 5000000
              |                WHEN 1 THEN id + 7000000
              |                ELSE id + 6000000 END AS way_id,
              |       CAST(CASE WHEN seq = 2 THEN 5 ELSE 3 END AS INTEGER) AS n_pts,
              |       CAST(CASE WHEN seq = 2 THEN 1 ELSE 0 END AS INTEGER) AS closed,
              |       CAST(9 + 16 * (CASE WHEN seq = 2 THEN 5 ELSE 3 END)
              |            AS INTEGER) AS wkb_bytes,
              |       round(2 * d, 6) AS len_deg
              |FROM (SELECT id, d, unnest(generate_series(0, 2)) AS seq FROM $relSql)
              |ORDER BY way_id""".stripMargin),
      doc = "schema.sql:194 ways.linestring: WKB linestring for open ways + path length"),

    // the reference's real F7 behavior: multipolygon-relation-derived
    // areas REACH the classifier (the isinstance guard never fires,
    // filter.py:227-232) — so classification must run on relation areas
    // with the relation's own tags and id (C5 orig_id)
    Q("poi_classify_multipolygon",
      (s, dir) => {
        val settings = PoiQueries.baseSettings.copy(keys = Seq("brand", "parttype"))
        val dim = graft.operators.TagDimension.prepare(
          Tables.classificationDimDf(s), settings)
        val pairs = graft.operators.TagDimension.toPairs(dim, settings)
        val areas = graft.operators.RelationAssembly.relationAreas(
          Tables.osmRelations(s, dir), Tables.osmRelationWays(s, dir))
        graft.operators.PoiClassifier.classify(areas, pairs, settings)
          .select(col("id"),
            element_at(col("tags"), "brand").as("brand"),
            length(col("geom")).as("wkb_bytes"))
          .orderBy(col("id"))
      },
      Some("""SELECT p_partkey AS id, p_brand AS brand,
             |       CAST(106 + CASE WHEN p_partkey % 10 = 0 THEN 84 ELSE 0 END
             |            AS INTEGER) AS wkb_bytes
             |FROM part
             |WHERE p_partkey % 5 = 0
             |  AND (p_brand = 'Brand#13' OR p_type IN ('PROMO', 'ECONOMY'))
             |ORDER BY id""".stripMargin),
      doc = "F7-real+J3+C4+C5: classify relation-derived areas (orig_id, holes in WKB)"),

    // X1-real: the reference ships an (empty) osmosisupdate() hook for
    // replication diffs; this is the actual operation — upsert by
    // (id, max version), visible=false rows delete
    Q("osm_apply_diff",
      (s, dir) => {
        val base = Tables.osmNodes(s, dir).withColumn("visible", lit(true))
        val changes = Tables.osmNodes(s, dir)
          .filter(col("id") % 7 === 3 || col("id") % 7 === 5)
          .withColumn("version", lit(2).cast("int"))
          .withColumn("tags",
            map_concat(col("tags"), map(lit("edited"), lit("yes"))))
          .withColumn("visible", col("id") % 7 =!= 5)
        graft.operators.OsmDiff.applyDiff(base, changes)
          .select(col("id"), col("version"),
            element_at(col("tags"), "edited").as("edited"))
          .orderBy(col("id"))
      },
      Some("""SELECT o_orderkey AS id,
             |       CAST(CASE WHEN o_orderkey % 7 = 3 THEN 2 ELSE 1 END
             |            AS INTEGER) AS version,
             |       CASE WHEN o_orderkey % 7 = 3 THEN 'yes' END AS edited
             |FROM orders
             |WHERE o_orderkey % 7 <> 5
             |ORDER BY id""".stripMargin),
      doc = "X1-real: replication-diff upsert (max-version wins, visible=false deletes)")
  )
}

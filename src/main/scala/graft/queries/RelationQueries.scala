package graft.queries

import graft.functions.GeoFunctions
import graft.operators.RelationAssembly
import graft.queries.Catalog.OrderByOnce
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
          .orderByOnce(col("id"))
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
          .orderByOnce(col("way_id"))
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

    // Multipolygon CONTAINMENT join (round-16: closes the loop between
    // C4's hole support and the geo-join family): points vs the
    // ASSEMBLED relations — outer rings stitched from split member
    // ways, holes resolved INTERNALLY by GeoJoin.pointsInMultipolygons'
    // even-odd parity (a point inside a hole does NOT match). Points
    // ride the poi_in_way_area lattice (half-step off every outer AND
    // hole edge — both live on the d/4 lattice, points on the
    // 0.0005-offset one, so boundary conventions never fire). An
    // sf-independent PLANT pins the hole semantics in the gate at
    // every scale: a relation at lat 75-76 (empty of real data) with
    // one point in its hole (must be ABSENT) and one in its ring
    // (must be present); the oracle replays outer-minus-hole with
    // strict BETWEEN from the same coordinate laws.
    Q("poi_in_multipolygon",
      (s, dir) => {
        import graft.operators.GeoJoin
        import s.implicits._
        def cl(ps: Seq[(Double, Double)]) = ps :+ ps.head
        val mp = RelationAssembly.assembleMultipolygons(
            Tables.osmRelations(s, dir), Tables.osmRelationWays(s, dir))
          .select(col("id"), col("outers"), col("inners"))
        val plantMp = Seq((900000001L,
            Seq(cl(Seq((0.0, 75.0), (1.0, 75.0), (1.0, 76.0), (0.0, 76.0)))),
            Seq(cl(Seq((0.25, 75.25), (0.75, 75.25), (0.75, 75.75),
              (0.25, 75.75))))))
          .toDF("id", "rawouters", "rawinners")
          .select($"id",
            expr("transform(rawouters, r -> transform(r, " +
              "p -> struct(p._1 AS lon, p._2 AS lat)))").as("outers"),
            expr("transform(rawinners, r -> transform(r, " +
              "p -> struct(p._1 AS lon, p._2 AS lat)))").as("inners"))
        val pts = Tables.orders(s, dir).select(
            col("o_orderkey").as("id"),
            ((col("o_totalprice") % 300) - 150 + 0.0005).as("lon"),
            ((col("o_orderkey") % 120) - 60 +
              (col("o_orderkey") % 97) / 1000.0 + 0.0005).as("lat"))
          .unionByName(Seq(
            (900000001L, 0.5, 75.5), // inside the planted HOLE: excluded
            (900000002L, 0.1, 75.1)) // inside the planted ring: included
            .toDF("id", "lon", "lat"))
        GeoJoin.pointsInMultipolygons(pts, mp.unionByName(plantMp),
            "id", "lon", "lat", "id", "outers", "inners", cellDeg = 0.5)
          .orderBy(col("point_id"), col("poly_id"))
      },
      Some("""WITH pts AS (SELECT o_orderkey AS id,
             |               (o_totalprice % 300) - 150 + 0.0005 AS lon,
             |               (o_orderkey % 120) - 60
             |                 + (o_orderkey % 97) / 1000.0 + 0.0005 AS lat
             |             FROM orders
             |             UNION ALL SELECT * FROM (VALUES
             |               (CAST(900000001 AS BIGINT), 0.5, 75.5),
             |               (CAST(900000002 AS BIGINT), 0.1, 75.1))
             |               v(id, lon, lat)),
             |rel AS (SELECT p_partkey AS id,
             |          CASE WHEN p_size <= 25 THEN 0.001 ELSE 0.1 END AS d,
             |          (p_retailprice % 300) - 150 AS lon0,
             |          (p_partkey % 120) - 60 AS lat0,
             |          p_partkey % 10 = 0 AS has_inner
             |        FROM part WHERE p_partkey % 5 = 0
             |        UNION ALL
             |        SELECT CAST(900000001 AS BIGINT), 1.0, 0.0, 75.0, TRUE)
             |SELECT p.id AS point_id, r.id AS poly_id
             |FROM pts p JOIN rel r ON
             |  p.lon > r.lon0 AND p.lon < r.lon0 + r.d AND
             |  p.lat > r.lat0 AND p.lat < r.lat0 + r.d AND
             |  NOT (r.has_inner
             |    AND p.lon > r.lon0 + r.d/4 AND p.lon < r.lon0 + 3*r.d/4
             |    AND p.lat > r.lat0 + r.d/4 AND p.lat < r.lat0 + 3*r.d/4)
             |ORDER BY point_id, poly_id""".stripMargin),
      doc = "multipolygon containment join: assembled relations (stitched outers + holes) vs points, holes resolved internally by even-odd ring parity; planted hole/ring point pair pins the exclusion at every sf"),

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

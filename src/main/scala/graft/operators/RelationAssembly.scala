package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** J3 — relation membership and multipolygon assembly (SURVEY.md §2.4).
  *
  * The reference's DDL carries `relations` / `relation_members`
  * (schema.sql:105-138), and osmium's area assembler feeds
  * multipolygon-relation-derived areas into the `area()` callback — the
  * reference's `isinstance` guard is ineffective (filter.py:227-232,
  * SURVEY §7.4.4) — so a faithful engine needs member expansion and
  * outer/inner ring assembly.
  *
  * Scale model: member expansion is a narrow posexplode (X2's shape);
  * geometry assembly is member⋈way-path equi-joins plus ONE
  * groupBy-relation — stitching runs per relation on its own collected
  * member paths (relations have bounded member counts in practice; the
  * shuffle carries only the member paths actually referenced). No
  * driver-side state.
  */
object RelationAssembly {

  /** The pgsnapshot `relation_members` relation (schema.sql:112-122):
    * one row per member with its 0-based `sequence_id` = array position.
    */
  def relationMembers(relations: DataFrame): DataFrame =
    relations.select(col("id").as("relation_id"),
        posexplode(col("members")).as(Seq("sequence_id", "m")))
      .select(col("relation_id"), col("sequence_id"),
        col("m.member_type").as("member_type"),
        col("m.member_id").as("member_id"),
        col("m.member_role").as("member_role"))

  /** Stitch open/closed member paths into closed rings: repeatedly seed
    * a ring with the first unused path, then extend with any unused path
    * that continues the ring's free end (reversing when its END touches),
    * until the ring closes. Deterministic (input order), pure, local to
    * one relation. Unclosable leftovers are dropped (the F6 invalid-
    * geometry policy; osmium's assembler errors similarly).
    */
  private[operators] def stitchRings(
      paths: Seq[Seq[(Double, Double)]]): Seq[Seq[(Double, Double)]] = {
    val pool = scala.collection.mutable.ArrayBuffer.from(
      paths.filter(p => p != null && p.length >= 2))
    val rings = scala.collection.mutable.ArrayBuffer.empty[Seq[(Double, Double)]]
    while (pool.nonEmpty) {
      var ring = pool.remove(0).toVector
      var stuck = false
      while (ring.head != ring.last && !stuck) {
        val i = pool.indexWhere(p => p.head == ring.last || p.last == ring.last)
        if (i < 0) stuck = true
        else {
          val p = pool.remove(i)
          ring = ring ++ (if (p.head == ring.last) p.tail else p.reverse.tail)
        }
      }
      if (!stuck && ring.length >= 4) rings += ring
    }
    rings.toSeq
  }

  /** Public: the UDF encoder generates Java that constructs/reads this
    * class; `private` makes it inaccessible to the generated code —
    * Janino fails with "No applicable constructor/method found" and the
    * whole projection silently falls back to interpreter mode.
    */
  case class Pt(lon: Double, lat: Double)

  /** Point structs ride in as `array<array<double>>` (nested Row inputs
    * have no UDF encoder in Spark 4); output re-materializes the
    * (lon, lat) struct shape.
    */
  private val stitchUdf = udf { (paths: Seq[Seq[Seq[Double]]]) =>
    stitchRings(paths.map(_.map(p => (p(0), p(1)))))
      .map(_.map { case (lon, lat) => Pt(lon, lat) })
  }

  private def pathsAsDoubles(pathsCol: org.apache.spark.sql.Column) =
    transform(pathsCol, p => transform(p.getField("path"),
      q => array(q.getField("lon"), q.getField("lat"))))

  /** Assemble multipolygon relations: outer ring(s) from role=outer
    * members, hole ring(s) from role=inner, member ways resolved
    * against `wayPaths(way_id, path array<struct<lon,lat>>)` (produce it
    * with [[WayAssembly.assembleRings]] or any geometry source). Only
    * `type=multipolygon` relations and way-typed members participate
    * (the blank role counts as outer, as osmium treats it).
    * Output: (id, outers, inners) — ring arrays ordered by member
    * sequence, each ring closed. Relations whose outers don't stitch
    * into ≥ 1 closed ring are dropped (invalid geometry, F6).
    */
  def assembleMultipolygons(relations: DataFrame, wayPaths: DataFrame): DataFrame = {
    val members = relationMembers(
        relations.filter(element_at(col("tags"), "type") === "multipolygon"))
      .filter(col("member_type") === "W" &&
        col("member_role").isin("outer", "inner", ""))
    val joined = members.join(wayPaths, col("member_id") === col("way_id"))
      .select(col("relation_id"), col("sequence_id"),
        when(col("member_role") === "inner", lit("inner")).otherwise(lit("outer"))
          .as("role"),
        col("path"))
    val grouped = joined.groupBy(col("relation_id"))
      .agg(
        sort_array(collect_list(
          when(col("role") === "outer", struct(col("sequence_id"), col("path")))))
          .as("outer_paths"),
        sort_array(collect_list(
          when(col("role") === "inner", struct(col("sequence_id"), col("path")))))
          .as("inner_paths"))
    grouped.select(col("relation_id").as("id"),
        stitchUdf(pathsAsDoubles(col("outer_paths"))).as("outers"),
        stitchUdf(pathsAsDoubles(col("inner_paths"))).as("inners"))
      .filter(size(col("outers")) >= 1)
  }

  /** Relation-derived AREA rows in the ways/areas projection shape —
    * what the reference's `area()` callback actually receives (its
    * `isinstance` guard never fires, filter.py:227-232): the relation's
    * own metadata and tags (C5 `orig_id` semantics — osmium area ids
    * are synthetic, the originating relation id is the durable one)
    * with assembled multipolygon WKB geometry (holes included). Feed to
    * [[PoiClassifier.classify]] exactly like nodes/ways.
    */
  def relationAreas(relations: DataFrame, wayPaths: DataFrame): DataFrame =
    assembleMultipolygons(relations, wayPaths)
      .join(relations.select(col("id"), col("version"), col("user_id"),
        col("tstamp"), col("changeset_id"), col("tags")), Seq("id"))
      .select(col("id"), col("version"), col("user_id"), col("tstamp"),
        col("changeset_id"), col("tags"),
        graft.functions.GeoFunctions
          .wkb_multipolygon_areas(col("outers"), col("inners")).as("geom"))
}

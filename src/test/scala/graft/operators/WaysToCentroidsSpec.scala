package graft.operators

import graft.SparkSpec
import graft.functions.GeoFunctions
import graft.model.OsmModel
import graft.sinks.PoiSink
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** F8/C8/C10/U1 over the testdata ways derivation, plus the projector's
  * F6 dead-letter split (K3).
  */
class WaysToCentroidsSpec extends SparkSpec {
  import spark.implicits._

  test("centroidRows: threshold filter, id offset, WKB centroid decode") {
    val ways = Tables.osmWays(spark, sf())
    val rows = WaysToCentroids.centroidRows(ways)
    val n = rows.count()
    val small = ways.filter(col("id") % 2 === 0) // just sanity: subset smaller
    assert(n > 0 && n < ways.count())
    // ids all offset
    assert(rows.filter(col("id") < OsmModel.CentroidIdOffset).count() == 0)
    // decode one centroid and check it sits inside its source square
    val r = rows.orderBy(col("id")).select(col("id"), col("geom")).head()
    val (cx, cy) = GeoFunctions.decodePoint(r.getAs[Array[Byte]]("geom"))
    val srcId = r.getLong(0) - OsmModel.CentroidIdOffset
    val ring = ways.filter(col("id") === srcId).select(col("ring")).head()
      .getSeq[org.apache.spark.sql.Row](0).map(p => (p.getDouble(0), p.getDouble(1)))
    assert(cx >= ring.map(_._1).min && cx <= ring.map(_._1).max)
    assert(cy >= ring.map(_._2).min && cy <= ring.map(_._2).max)
  }

  test("appendToNodes: union keeps schema, id spaces disjoint (U1)") {
    val settings = graft.queries.PoiQueries.baseSettings
    val dim = TagDimension.prepare(Tables.classificationDimDf(spark), settings)
    val pairs = TagDimension.toPairs(dim, settings)
    val nodes = PoiProjector.projectNodes(
      PoiClassifier.classify(Tables.osmNodes(spark, sf()), pairs, settings), settings)
    val centroids = WaysToCentroids.centroidRows(Tables.osmWays(spark, sf()))
    val all = WaysToCentroids.appendToNodes(nodes, centroids)
    assert(all.count() == nodes.count() + centroids.count())
    assert(all.select(col("id")).distinct().count() == all.count())
  }

  test("projector F6 split: invalid ring → dead letter branch") {
    val ways = Seq(
      (1L, Seq((0.0, 0.0), (0.001, 0.0), (0.001, 0.001), (0.0, 0.001), (0.0, 0.0))),
      (2L, Seq((0.0, 0.0), (1.0, 1.0))) // invalid: unclosed, < 4 points
    ).toDF("id", "rawRing")
      .select(col("id"), lit(1).as("version"), lit(1).as("user_id"),
        current_timestamp().as("tstamp"), lit(1L).as("changeset_id"),
        map(lit("k"), lit("v")).as("tags"),
        transform(col("rawRing"),
          p => struct(p.getField("_1").as("lon"), p.getField("_2").as("lat"))).as("ring"))
    val projected = PoiProjector.projectWays(ways, graft.queries.PoiQueries.baseSettings)
    val (good, bad) = PoiProjector.splitInvalid(projected)
    assert(good.select("id").as[Long].collect().toSeq == Seq(1L))
    assert(bad.select("id").as[Long].collect().toSeq == Seq(2L))
    // K3 dead-letter write round-trips
    val tmp = java.nio.file.Files.createTempDirectory("dead").toString + "/dl"
    PoiSink.writeDeadLetter(bad, tmp)
    assert(spark.read.parquet(tmp).count() == 1)
  }
}

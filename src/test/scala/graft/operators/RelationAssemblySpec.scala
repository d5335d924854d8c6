package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class RelationAssemblySpec extends SparkSpec {
  import spark.implicits._

  private val A = (0.0, 0.0); private val B = (1.0, 0.0)
  private val C = (1.0, 1.0); private val D = (0.0, 1.0)

  test("stitchRings: two open halves close into one ring") {
    val rings = RelationAssembly.stitchRings(Seq(Seq(A, B, C), Seq(C, D, A)))
    assert(rings == Seq(Seq(A, B, C, D, A)))
  }

  test("stitchRings: reversed continuation is flipped into place") {
    // second path runs A -> D -> C: its END touches the ring's free end
    val rings = RelationAssembly.stitchRings(Seq(Seq(A, B, C), Seq(A, D, C)))
    assert(rings == Seq(Seq(A, B, C, D, A)))
  }

  test("stitchRings: closed ring passes through; unclosable path dropped") {
    val closed = Seq(A, B, C, D, A)
    val dangling = Seq((5.0, 5.0), (6.0, 6.0))
    assert(RelationAssembly.stitchRings(Seq(closed, dangling)) == Seq(closed))
    assert(RelationAssembly.stitchRings(Seq(dangling)) == Nil)
  }

  test("stitchRings: two disjoint ring groups both assemble") {
    val e = (9.0, 9.0); val f = (9.5, 9.0); val g = (9.5, 9.5)
    val rings = RelationAssembly.stitchRings(
      Seq(Seq(A, B, C), Seq(e, f, g), Seq(g, e), Seq(C, D, A)))
    assert(rings.toSet == Set(Seq(A, B, C, D, A), Seq(e, f, g, e)))
  }

  test("relationMembers: explode preserves order and Osmosis type codes") {
    val got = RelationAssembly.relationMembers(
        Tables.osmRelations(spark, sf()))
      .orderBy("relation_id", "sequence_id")
      .as[(Long, Int, String, Long, String)].collect()
    assert(got.nonEmpty)
    val byRel = got.groupBy(_._1)
    byRel.foreach { case (rid, ms) =>
      assert(ms.map(_._2).toSeq == ms.indices.toSeq) // dense sequence ids
      assert(ms.forall(_._3 == "W"))
      val expected =
        if (rid % 10 == 0) Seq("outer", "outer", "inner") else Seq("outer", "outer")
      assert(ms.map(_._5).toSeq == expected)
    }
  }

  test("assembleMultipolygons: XML fixture relation assembles its way ring") {
    val path = getClass.getResource("/sample.osm").getPath
    val rels = spark.read.format("osm-xml").option("kind", "relations").load(path)
    val ways = spark.read.format("osm-xml").option("kind", "ways").load(path)
    val nodes = spark.read.format("osm-xml").option("kind", "nodes").load(path)
      .select(col("id").as("node_id"), col("lon"), col("lat"))
    val wayPaths = WayAssembly.assembleRings(ways.select(col("id"), col("nodes")), nodes)
      .select(col("id").as("way_id"), col("ring").as("path"))
    val mp = RelationAssembly.assembleMultipolygons(rels, wayPaths).collect()
    assert(mp.length == 1)
    val outers = mp(0).getSeq[scala.collection.Seq[org.apache.spark.sql.Row]](
      mp(0).fieldIndex("outers"))
    assert(outers.length == 1)
    assert(mp(0).getSeq[Any](mp(0).fieldIndex("inners")).isEmpty)
    val ring = outers.head
    assert(ring.length == 4 && ring.head == ring.last)
  }

  test("assembleMultipolygons: split outers stitch, holes subtract area") {
    val mp = RelationAssembly.assembleMultipolygons(
      Tables.osmRelations(spark, sf()), Tables.osmRelationWays(spark, sf()))
    val rows = mp.select(col("id"), size(col("outers")).as("no"),
        size(col("inners")).as("ni"),
        size(element_at(col("outers"), 1)).as("pts"))
      .as[(Long, Int, Int, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, no, ni, pts) =>
      assert(no == 1 && pts == 5)
      assert(ni == (if (id % 10 == 0) 1 else 0))
    }
  }
}

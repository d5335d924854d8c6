package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Osmosis 7-table pgsnapshot layout (schema.sql:95-198) written
  * from the XML fixture and read back.
  */
class PgSnapshotLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("writes all seven pgsnapshot tables from the XML fixture") {
    val path = getClass.getResource("/sample.osm").getPath
    def rd(kind: String) =
      spark.read.format("osm-xml").option("kind", kind).load(path)
    val out = java.nio.file.Files.createTempDirectory("pgsnap").toString
    PgSnapshotLayout.write(rd("nodes"), rd("ways"), rd("relations"), out)

    val nodes = spark.read.parquet(s"$out/nodes")
    assert(nodes.count() == 3)
    assert(nodes.columns.toSeq ==
      Seq("id", "version", "user_id", "tstamp", "changeset_id", "tags", "geom"))
    assert(nodes.filter(col("geom").isNull).count() == 0)
    assert(nodes.select(length(col("geom"))).as[Int].collect().forall(_ == 21))

    val ways = spark.read.parquet(s"$out/ways")
    assert(ways.count() == 1)
    assert(ways.columns.contains("linestring"))

    val wayNodes = spark.read.parquet(s"$out/way_nodes")
      .orderBy("way_id", "sequence_id")
      .as[(Long, Long, Int)].collect()
    assert(wayNodes.toSeq == Seq((201L, 101L, 0), (201L, 102L, 1),
      (201L, 103L, 2), (201L, 101L, 3)))

    assert(spark.read.parquet(s"$out/relations").count() == 1)
    val members = spark.read.parquet(s"$out/relation_members")
      .as[(Long, Int, String, Long, String)].collect()
    assert(members.toSeq == Seq((301L, 0, "W", 201L, "outer")))

    val users = spark.read.parquet(s"$out/users").orderBy("id")
      .as[(Int, String)].collect()
    assert(users.toSeq == Seq((7, "alice"), (8, "bob"), (9, "carol")))

    assert(spark.read.parquet(s"$out/schema_info").as[Int].collect().toSeq == Seq(6))
  }

  test("visible flag defaults to true; user_name reaches source rows") {
    val path = getClass.getResource("/sample.osm").getPath
    val nodes = spark.read.format("osm-xml").option("kind", "nodes").load(path)
    val got = nodes.select("id", "user_name", "visible")
      .as[(Long, String, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((101L, "alice", true), (102L, "bob", true),
      (103L, "bob", true)))
  }
}

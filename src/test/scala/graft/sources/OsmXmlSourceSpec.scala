package graft.sources

import graft.SparkSpec
import graft.model.PoiSettings
import graft.operators.{PoiClassifier, WayAssembly}
import org.apache.spark.sql.functions._

/** S1 — the OSM XML DataSource V2 (SURVEY.md §2.1), end-to-end into the
  * classification and assembly operators.
  */
class OsmXmlSourceSpec extends SparkSpec {
  import spark.implicits._

  private val samplePath =
    getClass.getResource("/sample.osm").getPath

  private def nodes = spark.read.format("osm-xml")
    .option("kind", "nodes").load(samplePath)
  private def ways = spark.read.format("osm-xml")
    .option("kind", "ways").load(samplePath)

  test("reads nodes with tags, coordinates, and timestamps") {
    val rows = nodes.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(101L, 102L, 103L))
    val cafe = rows(0)
    assert(cafe.getAs[Map[String, String]]("tags") ==
      Map("amenity" -> "cafe", "name" -> "Espresso Lab"))
    assert(cafe.getAs[Double]("lon") == 13.405 && cafe.getAs[Double]("lat") == 52.52)
    assert(cafe.getAs[java.sql.Timestamp]("tstamp").toInstant.toString ==
      "2024-03-04T05:06:07Z")
    assert(rows(1).getAs[Map[String, String]]("tags").isEmpty)
  }

  test("reads .osm.bz2 and .osm.gz transparently (planet-extract forms)") {
    val conf = spark.sessionState.newHadoopConf()
    val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(samplePath))
    for (ext <- Seq("bz2", "gz")) {
      val dir = java.nio.file.Files.createTempDirectory(s"osm$ext")
      val out = new org.apache.hadoop.fs.Path(s"$dir/sample.osm.$ext")
      val codec = new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
        .getCodec(out)
      assert(codec != null, s"no hadoop codec for .$ext")
      val os = codec.createOutputStream(
        out.getFileSystem(conf).create(out))
      os.write(raw); os.close()
      val got = spark.read.format("osm-xml").option("kind", "nodes")
        .load(out.toString).orderBy("id").collect()
      assert(got.map(_.getLong(0)).toSeq == Seq(101L, 102L, 103L), s".$ext")
      assert(got(0).getAs[Map[String, String]]("tags")("amenity") == "cafe")
    }
  }

  test("reads ways with ordered node refs; relations are skipped (F7)") {
    val rows = ways.collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 201L)
    assert(rows(0).getSeq[Long](rows(0).fieldIndex("nodes")).toList ==
      List(101L, 102L, 103L, 101L))
    assert(rows(0).getAs[Map[String, String]]("tags")("amenity") == "restaurant")
  }

  test("column pruning reaches the scan (pruned ReadSchema, correct values)") {
    val pruned = nodes.select("id", "lat")
    val leafOutput = pruned.queryExecution.executedPlan.collectLeaves().head.output
    assert(leafOutput.map(_.name).toSet == Set("id", "lat"),
      s"scan not pruned: ${leafOutput.map(_.name)}")
    val got = pruned.orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((101L, 52.52), (102L, 52.50), (103L, 52.51)))
  }

  test("classification + J2 ring assembly run directly on the source") {
    val settings = PoiSettings(keys = Seq("amenity", "name"), minOccurrences = 100L)
    val pairs = Seq(("amenity", "cafe"), ("amenity", "restaurant"))
    val poiNodes = PoiClassifier.classify(nodes, pairs, settings)
    assert(poiNodes.select("id").as[Long].collect().toSeq == Seq(101L))

    val nodeLoc = nodes.select(col("id").as("node_id"), col("lon"), col("lat"))
    val rings = WayAssembly.assembleRings(ways, nodeLoc)
    val ring = rings.filter(col("id") === 201L)
      .select(col("ring")).as[Seq[(Double, Double)]].head()
    assert(ring.length == 4 && ring.head == ring.last)
    assert(ring.head == ((13.405, 52.52)))
  }
}

package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.osmpbf.ProtoWriter
import org.apache.spark.sql.functions._

/** S1 (PBF) — fixture file hand-encoded with [[ProtoWriter]] per the
  * public wire spec, carrying the SAME entities as sample.osm; the test
  * asserts the two sources agree.
  */
class OsmPbfSourceSpec extends SparkSpec {

  private lazy val pbfPath: String = {
    val path = Files.createTempDirectory("pbf").toString + "/sample.osm.pbf"
    writeFixture(path)
    path
  }

  private def epoch(s: String): Long = java.time.Instant.parse(s).getEpochSecond

  private def writeFixture(path: String): Unit = {
    val strings = Seq("", "amenity", "cafe", "name", "Espresso Lab", "highway",
      "bus_stop", "building", "yes", "restaurant", "Corner Bistro",
      "type", "multipolygon", "outer", "alice", "bob", "carol")
    def si(s: String): Long = strings.indexOf(s).toLong

    val st = new ProtoWriter
    strings.foreach(s => st.stringField(1, s))

    val t1 = epoch("2024-03-04T05:06:07Z")
    val t2 = epoch("2024-03-04T06:00:00Z")
    val t3 = epoch("2024-03-04T06:01:00Z")
    val di = new ProtoWriter
    di.packedVarintField(1, Seq(2L, 1L, 1L))
    di.packedSVarintField(2, Seq(t1, t2 - t1, t3 - t2))
    di.packedSVarintField(3, Seq(900L, 1L, 0L))
    di.packedSVarintField(4, Seq(7L, 1L, 0L))
    di.packedSVarintField(5, Seq(si("alice"), si("bob") - si("alice"), 0L)) // user_sid (delta)

    val dn = new ProtoWriter
    dn.packedSVarintField(1, Seq(101L, 1L, 1L))
    dn.bytesField(5, di.toByteArray)
    dn.packedSVarintField(8, Seq(525200000L, -200000L, 100000L)) // lat/100nano
    dn.packedSVarintField(9, Seq(134050000L, -50000L, 100000L))
    dn.packedVarintField(10, Seq(si("amenity"), si("cafe"), si("name"),
      si("Espresso Lab"), 0L, 0L, si("highway"), si("bus_stop"), 0L))
    val g1 = new ProtoWriter
    g1.bytesField(2, dn.toByteArray)

    val info = new ProtoWriter
    info.varintField(1, 3L)
    info.varintField(2, epoch("2024-03-05T00:00:00Z"))
    info.varintField(3, 902L)
    info.varintField(4, 9L)
    info.varintField(5, si("carol"))
    val way = new ProtoWriter
    way.varintField(1, 201L)
    way.packedVarintField(2, Seq(si("building"), si("amenity"), si("name")))
    way.packedVarintField(3, Seq(si("yes"), si("restaurant"), si("Corner Bistro")))
    way.bytesField(4, info.toByteArray)
    way.packedSVarintField(8, Seq(101L, 1L, 1L, -2L))
    val g2 = new ProtoWriter
    g2.bytesField(3, way.toByteArray)

    val relInfo = new ProtoWriter
    relInfo.varintField(1, 1L)
    relInfo.varintField(2, epoch("2024-03-05T00:00:00Z"))
    relInfo.varintField(3, 903L)
    relInfo.varintField(4, 9L)
    relInfo.varintField(5, si("carol"))
    val rel = new ProtoWriter
    rel.varintField(1, 301L)
    rel.packedVarintField(2, Seq(si("type")))
    rel.packedVarintField(3, Seq(si("multipolygon")))
    rel.bytesField(4, relInfo.toByteArray)
    rel.packedVarintField(8, Seq(si("outer"))) // roles_sid
    rel.packedSVarintField(9, Seq(201L)) // memids (delta)
    rel.packedVarintField(10, Seq(1L)) // types: WAY
    val g3 = new ProtoWriter
    g3.bytesField(4, rel.toByteArray)

    val pb = new ProtoWriter
    pb.bytesField(1, st.toByteArray)
    pb.bytesField(2, g1.toByteArray)
    pb.bytesField(2, g2.toByteArray)
    pb.bytesField(2, g3.toByteArray)
    val raw = pb.toByteArray

    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val cbuf = new Array[Byte](raw.length * 2 + 64)
    val clen = deflater.deflate(cbuf)
    deflater.end()

    val blob = new ProtoWriter
    blob.varintField(2, raw.length.toLong)
    blob.bytesField(3, cbuf.take(clen))
    val blobBytes = blob.toByteArray
    val bh = new ProtoWriter
    bh.stringField(1, "OSMData")
    bh.varintField(3, blobBytes.length.toLong)
    val bhBytes = bh.toByteArray

    val out = new java.io.DataOutputStream(new java.io.FileOutputStream(path))
    out.writeInt(bhBytes.length)
    out.write(bhBytes)
    out.write(blobBytes)
    out.close()
  }

  private def xmlPath = getClass.getResource("/sample.osm").getPath

  test("PBF nodes agree with the XML source on the same entities") {
    val pbf = spark.read.format("osm-pbf").option("kind", "nodes").load(pbfPath)
      .orderBy("id").collect()
    val xml = spark.read.format("osm-xml").option("kind", "nodes").load(xmlPath)
      .orderBy("id").collect()
    assert(pbf.length == xml.length)
    pbf.zip(xml).foreach { case (p, x) =>
      assert(p.getLong(0) == x.getLong(0))
      assert(p.getAs[Map[String, String]]("tags") == x.getAs[Map[String, String]]("tags"))
      assert(p.getAs[java.sql.Timestamp]("tstamp") == x.getAs[java.sql.Timestamp]("tstamp"))
      assert(p.getAs[Int]("version") == x.getAs[Int]("version"))
      assert(p.getAs[Long]("changeset_id") == x.getAs[Long]("changeset_id"))
      assert(math.abs(p.getAs[Double]("lon") - x.getAs[Double]("lon")) < 1e-9)
      assert(math.abs(p.getAs[Double]("lat") - x.getAs[Double]("lat")) < 1e-9)
      assert(p.getAs[String]("user_name") == x.getAs[String]("user_name"))
      assert(p.getAs[Boolean]("visible") && x.getAs[Boolean]("visible"))
    }
  }

  test("PBF ways agree with the XML source") {
    val pbf = spark.read.format("osm-pbf").option("kind", "ways").load(pbfPath).collect()
    val xml = spark.read.format("osm-xml").option("kind", "ways").load(xmlPath).collect()
    assert(pbf.length == 1 && xml.length == 1)
    val (p, x) = (pbf(0), xml(0))
    assert(p.getLong(0) == x.getLong(0))
    assert(p.getSeq[Long](p.fieldIndex("nodes")).toList ==
      x.getSeq[Long](x.fieldIndex("nodes")).toList)
    assert(p.getAs[Map[String, String]]("tags") == x.getAs[Map[String, String]]("tags"))
    assert(p.getAs[java.sql.Timestamp]("tstamp") == x.getAs[java.sql.Timestamp]("tstamp"))
    assert(p.getAs[String]("user_name") == "carol")
    assert(p.getAs[String]("user_name") == x.getAs[String]("user_name"))
  }

  test("PBF relations agree with the XML source") {
    val pbf = spark.read.format("osm-pbf").option("kind", "relations").load(pbfPath).collect()
    val xml = spark.read.format("osm-xml").option("kind", "relations").load(xmlPath).collect()
    assert(pbf.length == 1 && xml.length == 1)
    val (p, x) = (pbf(0), xml(0))
    assert(p.getLong(0) == 301L && x.getLong(0) == 301L)
    assert(p.getAs[Map[String, String]]("tags") ==
      Map("type" -> "multipolygon"))
    assert(p.getAs[Map[String, String]]("tags") == x.getAs[Map[String, String]]("tags"))
    def members(r: org.apache.spark.sql.Row): Seq[(String, Long, String)] =
      r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("members"))
        .map(m => (m.getString(0), m.getLong(1), m.getString(2)))
    assert(members(p) == Seq(("W", 201L, "outer")))
    assert(members(p) == members(x))
    assert(p.getAs[java.sql.Timestamp]("tstamp") == x.getAs[java.sql.Timestamp]("tstamp"))
  }

  test("unpacked (wiretype-0) repeated fields decode like packed ones") {
    // same way as the main fixture but with refs/keys/vals written one
    // tag per value — spec-legal, and previously silently dropped
    val strings = Seq("", "building", "yes")
    def si(s: String): Long = strings.indexOf(s).toLong
    val st = new ProtoWriter
    strings.foreach(s => st.stringField(1, s))
    val way = new ProtoWriter
    way.varintField(1, 77L)
    way.varintField(2, si("building"))
    way.varintField(3, si("yes"))
    way.tag(8, 0).writeSVarint(101L)
    way.tag(8, 0).writeSVarint(1L)
    way.tag(8, 0).writeSVarint(-2L)
    val g = new ProtoWriter
    g.bytesField(3, way.toByteArray)
    val pb = new ProtoWriter
    pb.bytesField(1, st.toByteArray)
    pb.bytesField(2, g.toByteArray)
    val raw = pb.toByteArray
    val blob = new ProtoWriter
    blob.bytesField(1, raw) // uncompressed variant (no raw_size)
    val blobBytes = blob.toByteArray
    val bh = new ProtoWriter
    bh.stringField(1, "OSMData")
    bh.varintField(3, blobBytes.length.toLong)
    val bhBytes = bh.toByteArray
    val path = Files.createTempDirectory("pbf-unpacked").toString + "/u.osm.pbf"
    val out = new java.io.DataOutputStream(new java.io.FileOutputStream(path))
    out.writeInt(bhBytes.length); out.write(bhBytes); out.write(blobBytes); out.close()

    val rows = spark.read.format("osm-pbf").option("kind", "ways").load(path).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 77L)
    assert(rows(0).getSeq[Long](rows(0).fieldIndex("nodes")).toList ==
      List(101L, 102L, 100L))
    assert(rows(0).getAs[Map[String, String]]("tags") == Map("building" -> "yes"))
  }

  test("blob index partitions the file (one partition per data blob)") {
    val df = spark.read.format("osm-pbf").option("kind", "nodes").load(pbfPath)
    assert(df.rdd.getNumPartitions == 1) // fixture has one OSMData blob
    assert(df.count() == 3)
  }
}

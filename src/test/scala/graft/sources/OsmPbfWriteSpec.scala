package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write-side round trips: df → DSv2 `osm-pbf` writer → this repo's
  * reader → identical rows. Exercises DenseNodes delta/string-table
  * encoding, way ref deltas, relation member encoding, and the
  * OSMHeader frame (skipped by the blob index).
  */
class OsmPbfWriteSpec extends SparkSpec {

  private def xmlPath = getClass.getResource("/sample.osm").getPath

  private def roundTrip(kind: String): (DataFrame, DataFrame) = {
    val src = spark.read.format("osm-xml").option("kind", kind).load(xmlPath)
    val dir = Files.createTempDirectory(s"pbfw-$kind").toString + "/out"
    src.write.format("osm-pbf").option("kind", kind).mode("append").save(dir)
    (src, spark.read.format("osm-pbf").option("kind", kind).load(dir))
  }

  private def sortedJson(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.map { c =>
      df.schema(c).dataType match {
        case _: org.apache.spark.sql.types.MapType =>
          // map iteration order is not canonical across encoders
          to_json(map_entries(col(c)).cast("array<struct<key:string,value:string>>"))
            .as(c)
        case org.apache.spark.sql.types.DoubleType =>
          // PBF stores 100-nanodeg integer units: compare at that
          // resolution (the decode double can differ in the last ulp)
          round(col(c), 7).as(c)
        case _ => to_json(struct(col(c))).as(c)
      }
    }
    df.select(cols.toIndexedSeq: _*).orderBy(col(df.columns.sorted.head))
      .collect().map(_.mkString("|")).toSeq
  }

  test("nodes round-trip bit-equal through the PBF writer") {
    val (src, back) = roundTrip("nodes")
    assert(back.count() == 3)
    assert(sortedJson(src) == sortedJson(back))
  }

  test("ways round-trip through the PBF writer") {
    val (src, back) = roundTrip("ways")
    assert(back.count() == 1)
    assert(sortedJson(src) == sortedJson(back))
  }

  test("relations round-trip through the PBF writer") {
    val (src, back) = roundTrip("relations")
    assert(back.count() == 1)
    assert(sortedJson(src) == sortedJson(back))
  }

  test("multi-partition write produces one blob-parallel file per task") {
    val src = spark.read.format("osm-xml").option("kind", "nodes").load(xmlPath)
      .repartition(2)
    val dir = Files.createTempDirectory("pbfw-mp").toString + "/out"
    src.write.format("osm-pbf").option("kind", "nodes").mode("append").save(dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".osm.pbf"))
    assert(files.length == 2)
    val back = spark.read.format("osm-pbf").option("kind", "nodes").load(dir)
    assert(back.count() == 3)
    assert(back.select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq == Seq(101L, 102L, 103L))
  }

  test("write rejects a mismatched schema") {
    // Spark's V2 writer null-fills by-name-resolved nullable columns,
    // so the failure surfaces either as the builder's schema require or
    // as an analysis error — both abort the write
    val bad = spark.range(3).toDF("wrong_col")
    val dir = Files.createTempDirectory("pbfw-bad").toString + "/out"
    intercept[Exception] {
      bad.write.format("osm-pbf").option("kind", "nodes").mode("append").save(dir)
    }
    assert(!new java.io.File(dir).exists() ||
      new java.io.File(dir).listFiles().forall(!_.getName.endsWith(".osm.pbf")))
  }
}

package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** XML write side: df → `osm-xml` writer → reader → identical rows,
  * including attribute escaping.
  */
class OsmXmlWriteSpec extends SparkSpec {
  import spark.implicits._

  private def xmlPath = getClass.getResource("/sample.osm").getPath

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.map { c =>
      df.schema(c).dataType match {
        case _: org.apache.spark.sql.types.MapType =>
          to_json(map_entries(col(c)).cast("array<struct<key:string,value:string>>")).as(c)
        case _ => to_json(struct(col(c))).as(c)
      }
    }
    df.select(cols.toIndexedSeq: _*).orderBy(col(df.columns.sorted.head))
      .collect().map(_.mkString("|")).toSeq
  }

  for (kind <- Seq("nodes", "ways", "relations"))
    test(s"$kind round-trip through the XML writer") {
      val src = spark.read.format("osm-xml").option("kind", kind).load(xmlPath)
      val dir = Files.createTempDirectory(s"xmlw-$kind").toString + "/out"
      src.write.format("osm-xml").option("kind", kind).mode("append").save(dir)
      val back = spark.read.format("osm-xml").option("kind", kind).load(dir)
      assert(canon(src) == canon(back))
    }

  test("attribute escaping survives a round trip") {
    val nasty = "a&b<c>d\"e'f\tg\nh"
    val df = Seq((1L, nasty)).toDF("id", "v")
      .select(col("id"), lit(1).cast("int").as("version"),
        lit(2).cast("int").as("user_id"),
        to_timestamp(lit("2024-01-01 00:00:00")).as("tstamp"),
        lit(3L).as("changeset_id"),
        map(lit("note"), col("v")).as("tags"),
        lit(13.4).as("lon"), lit(52.5).as("lat"),
        col("v").as("user_name"), lit(false).as("visible"))
    val dir = Files.createTempDirectory("xmlw-esc").toString + "/out"
    df.write.format("osm-xml").option("kind", "nodes").mode("append").save(dir)
    val back = spark.read.format("osm-xml").option("kind", "nodes").load(dir)
      .select("tags", "user_name", "visible")
      .as[(Map[String, String], String, Boolean)].head()
    assert(back._1 == Map("note" -> nasty))
    assert(back._2 == nasty)
    assert(!back._3)
  }
}

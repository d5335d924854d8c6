package graft.sinks

import graft.SparkSpec
import graft.model.PoiSettings
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** K1/K2 against a REAL database: the container has no Postgres, but
  * Spark ships embedded Derby (its Hive-metastore dependency), so the
  * JDBC sink's whole code path — dialect type mapping, batched
  * executeBatch flushes, duplicate-load abort — runs against an
  * actual SQL engine in-process instead of a mock recorder. The
  * pgsnapshot-ish row shape (id, version, tstamp, hstore string, WKB
  * bytes) exercises the type mapping a PostGIS target needs (binary
  * geometry column included).
  */
class JdbcRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("writeJdbc round-trips pgsnapshot-shaped rows through embedded Derby") {
    val rows = (1L to 97L).map { i =>
      (i, 1, new java.sql.Timestamp(1700000000000L + i * 1000),
        s""""amenity"=>"cafe_$i"""",
        graft.functions.GeoFunctions.wkbPointBytes(i % 180 - 90.0, i % 80 - 40.0))
    }
    val df = rows.toDF("id", "version", "tstamp", "tags", "geom")
    // writeAfter=10 → the 97 rows flush as 10 real executeBatch calls
    PoiSink.writeJdbc(df, url, "poi_nodes",
      PoiSettings(writeAfter = 10), SaveMode.ErrorIfExists)

    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "poi_nodes").load()
    assert(back.count() == 97)
    val got = back
      .select($"id", $"version", $"tstamp", $"tags", $"geom")
      .as[(Long, Int, java.sql.Timestamp, String, Array[Byte])]
      .collect().map(r => (r._1, r._2, r._3, r._4, r._5.toSeq)).toSet
    val want = rows.map(r => (r._1, r._2, r._3, r._4, r._5.toSeq)).toSet
    assert(got == want) // bytes, timestamps, hstore strings all intact

    // duplicate load aborts (the reference's PK-violation behavior,
    // SURVEY §7.4.6) — ErrorIfExists refuses the existing table
    intercept[Exception] {
      PoiSink.writeJdbc(df, url, "poi_nodes",
        PoiSettings(writeAfter = 10), SaveMode.ErrorIfExists)
    }
    // append mode is the sanctioned incremental path
    PoiSink.writeJdbc(df.withColumn("id", $"id" + 1000), url, "poi_nodes",
      PoiSettings(writeAfter = 10), SaveMode.Append)
    assert(spark.read.format("jdbc")
      .option("url", url).option("dbtable", "poi_nodes").load().count() == 194)
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end PBF throughput pin (r14 verdict task 7): synthesize a
  * planet-slice-sized DenseNodes PBF through [[graft.sources.osmpbf
  * .OsmPbfEncoder]] (the DSv2 writer), then measure the three rates a
  * capability-parity claim needs against the reference's hot loop
  * (`filter.py:213-228`, single-threaded osmium evaluate-per-object):
  * PBF write rows/s, blob-parallel scan rows/s (with the partition
  * count = the parallelism the blob index exposes), and the FULL
  * classify→project pipeline rows/s. `runMain graft.tools.PbfProbe
  * <sfDir> <millionsOfNodes>`.
  */
object PbfProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PbfProbe <sfDir> <millionsOfNodes>")
    val sfDir = args(0)
    val n = (args(1).toDouble * 1e6).toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.model.PoiSettings
    import graft.operators.PoiPipeline
    import spark.implicits._
    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    // a planet-slice tag mix: ~2% amenity, 1% shop, 0.5% tourism
    // (POI-classifiable), ~30% carry non-POI tags, the rest untagged
    val m = pmod(col("id"), lit(1000L))
    val amen = array(lit("restaurant"), lit("cafe"), lit("bar"),
      lit("school"), lit("bench"))
    val nodes = spark.range(n).select(
      col("id"),
      lit(1).cast("int").as("version"),
      pmod(col("id"), lit(99991L)).cast("int").as("user_id"),
      to_timestamp(lit("2026-01-01 00:00:00")).as("tstamp"),
      pmod(col("id"), lit(7919L)).as("changeset_id"),
      map_filter(map(
        lit("amenity"), when(m < 20,
          element_at(amen, (pmod(col("id"), lit(5)) + 1).cast("int"))),
        lit("shop"), when(m >= 20 && m < 30, lit("supermarket")),
        lit("tourism"), when(m >= 30 && m < 35, lit("hotel")),
        lit("name"), when(m < 28,
          concat(lit("poi "), col("id").cast("string"))),
        lit("highway"), when(m >= 100 && m < 300, lit("crossing")),
        lit("source"), when(m >= 300 && m < 400, lit("survey"))),
        (_, v) => v.isNotNull).as("tags"),
      (pmod(col("id"), lit(360000000L)) / 1e6 - 180).as("lon"),
      (pmod(col("id"), lit(170000000L)) / 1e6 - 85).as("lat"),
      lit(null).cast("string").as("user_name"),
      lit(true).as("visible"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pbfprobe-").toString + "/planet"
    val (wW, _) = t {
      nodes.repartition(32).write.format("osm-pbf")
        .option("kind", "nodes").mode("append").save(dir)
    }
    val sizeMb = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(dir)) / 1024 / 1024
    }
    println(f"[pbfprobe] n=$n%d write=${wW}%.1f s (${n / wW}%.0f rows/s), " +
      f"$sizeMb%d MB on disk")
    val back = spark.read.format("osm-pbf").option("kind", "nodes").load(dir)
    val parts = back.rdd.getNumPartitions
    for (r <- 1 to 2) {
      val (sT, cnt) = t(back.count())
      println(f"[pbfprobe] scan rep=$r: ${sT}%.1f s (${cnt / sT}%.0f rows/s) " +
        f"over $parts%d blob partitions")
      assert(cnt == n)
    }
    val dim = Seq(
      ("amenity", "restaurant", 100000L, true),
      ("amenity", "cafe", 100000L, true),
      ("amenity", "bar", 100000L, true),
      ("amenity", "school", 100000L, true),
      ("amenity", "bench", 100000L, true),
      ("shop", "supermarket", 100000L, true),
      ("tourism", "hotel", 100000L, true))
      .toDF("key", "value", "count", "in_wiki")
    val emptyWays = graft.sources.Tables.osmWays(spark, sfDir).limit(0)
    val settings = PoiSettings(keys = Seq("amenity", "shop", "tourism"),
      minOccurrences = 1L, skipWays = true)
    for (r <- 1 to 2) {
      val (pT, kept) = t(PoiPipeline
        .run(back, emptyWays, dim, settings).nodes.count())
      println(f"[pbfprobe] pipeline rep=$r: ${pT}%.1f s " +
        f"(${n / pT}%.0f nodes/s evaluated, $kept%d POIs kept)")
    }
    spark.stop()
  }
}

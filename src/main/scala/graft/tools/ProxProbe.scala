package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.GeoJoin
import graft.sources.Tables

/** Join-strategy and allocation A/B for the events_proximity_join
  * shape (r19): the query's composition band (112–212 s at sf10g)
  * co-moves with ~1.1 TB of in-window allocation; this probe times the
  * same plan under the default SMJ vs a shuffle-hash probe side, with
  * the per-rep memory line, to locate the allocator (sort/spill vs
  * join machinery).
  *
  * usage: ProxProbe <sfDir> [variant ...]   variants: smj shj
  */
object ProxProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val variants = if (args.length > 1) args.drop(1).toSeq else Seq("smj", "shj")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mem = new graft.Bench.MemListener
    spark.sparkContext.addSparkListener(mem)
    def pts = Tables.events(spark, sfDir)
      .filter(pmod(col("event_id"), lit(3)) === 0)
      .select(col("event_id").as("id"), col("ts"),
        ((col("value") % 360) - 180).as("lon"),
        ((col("value") % 170) - 85).as("lat"))
    variants.foreach { v =>
      val hint = v match {
        case "shj" => Some("shuffle_hash")
        case "merge" | "smj" => Some("merge")
        case _ => None
      }
      (1 to reps).foreach { i =>
        val allocPre = graft.Bench.allocatedBytes()
        mem.reset()
        val t0 = System.nanoTime()
        GeoJoin.withinDistanceEvents(pts, pts, "id", "lon", "lat", "ts",
            "id", "lon", "lat", "ts", radiusM = 200000.0,
            maxGapSeconds = 3600, selfPairs = true, probeHint = hint)
          .write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        try org.apache.spark.sql.graft.Bridge.waitListenerBus(spark)
        catch { case _: Exception => () }
        val allocGb = (graft.Bench.allocatedBytes() - allocPre) / (1024.0 * 1024 * 1024)
        println(f"[proxprobe] $v rep$i wall=$t%.1f " +
          mem.json(0, 0, allocGb))
      }
    }
    spark.stop()
  }
}

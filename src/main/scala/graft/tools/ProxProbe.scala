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
  *
  * r20 sort-tail variants (the verdict's #1 item — the declared
  * ORDER BY over the ~100M-pair output is the residual cost):
  *   count  — pair cardinality only (sizes the output once)
  *   plain  — select 5 cols + bare orderBy (pre-r19 shape: sampler
  *            re-executes the join)
  *   asis   — select + orderByOnce (r19 catalog shape: hash exchange
  *            under the sort)
  *   ckpt   — select + localCheckpoint + orderBy (materialize once as
  *            blocks; sampler AND range exchange read blocks — one
  *            full-output shuffle instead of two)
  *   keys   — sort only (id_a, id_b), payload dropped: the narrowing
  *            upper bound
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
    def joined = GeoJoin.withinDistanceEvents(pts, pts, "id", "lon", "lat", "ts",
        "id", "lon", "lat", "ts", radiusM = 200000.0,
        maxGapSeconds = 3600, selfPairs = true)
    def outCols = joined.select(col("id_a"), col("id_b"),
      unix_micros(col("ts_a")).as("ts_a_us"),
      unix_micros(col("ts_b")).as("ts_b_us"),
      round(col("dist_m"), 0).as("dist_m"))
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
        v match {
          case "count" =>
            println(s"[proxprobe] pairs=${joined.count()}")
          case "skew" =>
            // per-join-key pair-mass estimate: |A_g|·|B_g| per
            // (band, x, bkt) — locates the group(s) one task drowns in
            val ag = graft.operators.GeoJoin.proximityBuildKeys(pts,
              "id", "lon", "lat", "ts", 200000.0, 3600)
              .groupBy(col("__band"), col("__x"), col("__bkt"))
              .agg(count(lit(1)).as("ca"))
            val bg = graft.operators.GeoJoin.proximityProbeKeys(pts,
              "id", "lon", "lat", "ts", 200000.0, 3600)
              .groupBy(col("__bandb"), col("__xb"), col("__bktb"))
              .agg(count(lit(1)).as("cb"))
            val g = ag.join(bg, col("__band") === col("__bandb") &&
                col("__x") === col("__xb") && col("__bkt") === col("__bktb"))
              .select(col("__band"), col("__x"), col("__bkt"),
                col("ca"), col("cb"), (col("ca") * col("cb")).as("mass"))
            g.orderBy(col("mass").desc).show(24, false)
            g.selectExpr("sum(mass)", "count(*)", "sum(ca)", "sum(cb)")
              .show(false)
          case "plain" =>
            outCols.orderBy(col("id_a"), col("id_b"))
              .write.format("noop").mode("overwrite").save()
          case "asis" =>
            import graft.queries.Catalog.OrderByOnce
            outCols.orderByOnce(col("id_a"), col("id_b"))
              .write.format("noop").mode("overwrite").save()
          case "ckpt" =>
            val cp = outCols.localCheckpoint()
            cp.orderBy(col("id_a"), col("id_b"))
              .write.format("noop").mode("overwrite").save()
            cp.unpersist(blocking = false)
          case "pack" =>
            // single radix-sortable key: ids < 2^31 here, so
            // (id_a << 32 | id_b) orders exactly like (id_a, id_b)
            import graft.queries.Catalog.OrderByOnce
            outCols
              .withColumn("__k", shiftleft(col("id_a"), 32)
                .bitwiseOR(col("id_b")))
              .orderByOnce(col("__k"))
              .select(col("id_a"), col("id_b"), col("ts_a_us"),
                col("ts_b_us"), col("dist_m"))
              .write.format("noop").mode("overwrite").save()
          case "w256" =>
            outCols.repartition(col("id_a"), col("id_b"))
              .repartitionByRange(256, col("id_a"), col("id_b"))
              .sortWithinPartitions(col("id_a"), col("id_b"))
              .write.format("noop").mode("overwrite").save()
          case "packw256" =>
            outCols
              .withColumn("__k", shiftleft(col("id_a"), 32)
                .bitwiseOR(col("id_b")))
              .repartition(col("__k"))
              .repartitionByRange(256, col("__k"))
              .sortWithinPartitions(col("__k"))
              .select(col("id_a"), col("id_b"), col("ts_a_us"),
                col("ts_b_us"), col("dist_m"))
              .write.format("noop").mode("overwrite").save()
          case "keys" =>
            import graft.queries.Catalog.OrderByOnce
            joined.select(col("id_a"), col("id_b"))
              .orderByOnce(col("id_a"), col("id_b"))
              .write.format("noop").mode("overwrite").save()
          case _ =>
            GeoJoin.withinDistanceEvents(pts, pts, "id", "lon", "lat", "ts",
                "id", "lon", "lat", "ts", radiusM = 200000.0,
                maxGapSeconds = 3600, selfPairs = true, probeHint = hint)
              .write.format("noop").mode("overwrite").save()
        }
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

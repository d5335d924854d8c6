package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev loop: time named catalog queries in isolation (same session
  * shape as Bench, same noop sink) without paying for the whole
  * catalog. `runMain graft.tools.QueryTime <sfDir> <query> [query ...]`
  * — each query runs `reps` times (env SPARK_GRAFT_REPS, default 3) so
  * scheduler-noise vs. plan cost separates.
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryTime <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    // shuffle width is its own knob (the SkewProbe convention): a real
    // cluster sizes partitions to ~128 MB, not to core count
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // session warm-up
    // same per-query memory evidence as Bench (spill / GC / eviction /
    // occupancy) so isolated-vs-composition drift compares like for
    // like — set SPARK_GRAFT_MEM=off to silence the extra line
    val memOn = sys.env.getOrElse("SPARK_GRAFT_MEM", "on") != "off"
    val mem = new graft.Bench.MemListener
    if (memOn) spark.sparkContext.addSparkListener(mem)
    args.drop(1).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // Fault-isolated per query: a probe run deliberately walks operators
      // up to (and past) their breaking scale, so one query's stage death
      // must not cost the measurements queued behind it.
      try {
        val times = (1 to reps).map { i =>
          val storePre = graft.Bench.storageUsedMb(spark)
          val allocPre = graft.Bench.allocatedBytes()
          mem.reset()
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val t = (System.nanoTime() - t0) / 1e9
          if (memOn) {
            try org.apache.spark.sql.graft.Bridge.waitListenerBus(spark)
            catch { case _: Exception => () }
            val allocGb =
              if (allocPre < 0) Double.NaN
              else (graft.Bench.allocatedBytes() - allocPre) / (1024.0 * 1024 * 1024)
            println(s"[qtime-mem] $name rep$i " +
              mem.json(storePre, graft.Bench.storageUsedMb(spark), allocGb))
          }
          t
        }
        println(f"[qtime] $name%-28s ${times.map(t => f"$t%.2f").mkString(" ")}s")
      } catch {
        case e: Throwable =>
          println(s"[qtime] $name FAILED: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }
    spark.stop()
  }
}

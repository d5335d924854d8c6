package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

class EnrichAsofSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(name).toString

  // static feature snapshots: (user, snap_t, score)
  private def snapshots = Seq(
    (1L, 100L, 0.1), (1L, 200L, 0.2), (1L, 300L, 0.3),
    (2L, 150L, 0.5)
  ).toDF("user_id", "snap_t", "score")

  // events across two files = two micro-batches
  private val batch1 = Seq((10L, 1L, 120L), (11L, 1L, 250L), (12L, 2L, 100L))
  private val batch2 = Seq((13L, 1L, 300L), (14L, 1L, 990L), (15L, 2L, 150L))

  private def writeBatch(dir: String, name: String, rows: Seq[(Long, Long, Long)]): Unit =
    rows.toDF("event_id", "user_id", "t")
      .repartition(1).write.mode("append").parquet(s"$dir/$name")

  test("streaming enrichAsof equals batch AsofJoin across micro-batches") {
    val inDir = tmp("asof-in")
    writeBatch(inDir, "b1", batch1)
    writeBatch(inDir, "b2", batch2)

    val stream = spark.readStream
      .schema("event_id long, user_id long, t long")
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir + "/*")
    val q = EventStream.enrichAsof(stream, snapshots,
        key = "user_id", eventTime = "t", snapTime = "snap_t",
        payload = Seq("score"))
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("asof_out")
      .select($"event_id", $"user_id", $"t", $"score", $"snap_time")
      .orderBy($"event_id").collect().toSeq

    val allEvents = (batch1 ++ batch2).toDF("event_id", "user_id", "t")
    val batch = AsofJoin.asof(allEvents, snapshots,
        key = "user_id", probeTime = "t", buildTime = "snap_t",
        payload = Seq("score"), buildTimeAs = Some("snap_time"))
      .orderBy($"event_id").collect().toSeq
    assert(streamed === batch)
    // sanity on the semantics themselves
    val byId = streamed.map(r => r.getLong(0) -> (r.getDouble(3), r.getLong(4))).toMap
    assert(byId === Map(
      10L -> (0.1, 100L), // between snap 100 and 200
      11L -> (0.2, 200L),
      13L -> (0.3, 300L), // equal-time inclusive
      14L -> (0.3, 300L), // far after the last snapshot
      15L -> (0.5, 150L)))
    // event 12 (t=100 < user 2's first snapshot at 150) dropped by inner
  }

  test("left mode keeps pre-snapshot events with null payload") {
    val out = EventStream.enrichAsof(
      Seq((12L, 2L, 100L)).toDF("event_id", "user_id", "t"),
      snapshots, "user_id", "t", "snap_t", Seq("score"), inner = false)
    val r = out.collect()
    assert(r.length === 1 && r(0).isNullAt(3) && r(0).isNullAt(4))
  }
}

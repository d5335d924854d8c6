package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[EventStream.attributionPairs]] as a watermarked STREAM-STREAM
  * interval join: the same operator must produce the same pair set
  * streaming (across micro-batch boundaries, with both sides' state
  * buffered and evicted by derived watermarks) as batch-on-batch.
  */
class AttributionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int) = new java.sql.Timestamp(3600000L + min * 60000L)

  // (user, id, ts): clicks c1..c4, purchases p1..p4.
  //   u1: click@0  → purchases @10 (in) and @40 (out of 30-min window)
  //   u1: click@35 → purchase @40 (in)
  //   u2: click@5  → purchase @4 (before click: no match)
  //   u3: purchase @20 with no click: no match
  private val clickRows = Seq(
    (1L, 101L, t(0)), (1L, 102L, t(35)), (2L, 103L, t(5)), (4L, 104L, t(50)))
  private val convRows = Seq(
    (1L, 201L, t(10)), (1L, 202L, t(40)), (2L, 203L, t(4)), (3L, 204L, t(20)))

  private def batchPairs = {
    val clicks = clickRows.toDF("user_id", "click_id", "click_ts")
    val convs = convRows.toDF("user_id", "purchase_id", "purchase_ts")
    EventStream.attributionPairs(clicks, convs,
      "user_id", "click_ts", "purchase_ts", windowMinutes = 30)
  }

  test("batch semantics: window is inclusive-start, exclusive-end, same-key only") {
    val got = batchPairs.select("click_id", "purchase_id")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((101L, 201L), (102L, 202L)))
  }

  test("stream-stream join equals batch across micro-batch boundaries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val pIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = EventStream.attributionPairs(
      cIn.toDF().toDF("user_id", "click_id", "click_ts")
        .withWatermark("click_ts", "10 minutes"),
      pIn.toDF().toDF("user_id", "purchase_id", "purchase_ts")
        .withWatermark("purchase_ts", "10 minutes"),
      "user_id", "click_ts", "purchase_ts", windowMinutes = 30)
    val q = joined.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    // batch 1: early clicks only — matches must wait in click state
    cIn.addData(clickRows.take(3): _*)
    q.processAllAvailable()
    // batch 2: purchases arrive; p@10 must match the batch-1 click@0
    pIn.addData(convRows.take(2): _*)
    q.processAllAvailable()
    // batch 3: the rest, interleaved the other way round
    pIn.addData(convRows.drop(2): _*)
    cIn.addData(clickRows.drop(3): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("attr_out").select("click_id", "purchase_id")
      .as[(Long, Long)].collect().toSet
    val batch = batchPairs.select("click_id", "purchase_id")
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("non-key column collision is rejected up front") {
    val clicks = clickRows.toDF("user_id", "id", "click_ts")
    val convs = convRows.toDF("user_id", "id", "purchase_ts")
    val e = intercept[IllegalArgumentException] {
      EventStream.attributionPairs(clicks, convs,
        "user_id", "click_ts", "purchase_ts", 30)
    }
    assert(e.getMessage.contains("collision"))
  }
}

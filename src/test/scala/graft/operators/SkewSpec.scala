package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed keys") {
    // lineitem.l_suppkey is hot (10 suppliers, 60k rows at sf0.001)
    val li = Tables.lineitem(spark, sf()).select("l_suppkey", "l_quantity")
    val supRenamed = Tables.supplier(spark, sf())
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    val plain = li.join(supRenamed, "l_suppkey")
      .groupBy("s_name").agg(round(sum("l_quantity"), 2).as("q"))
    val salted = Skew.saltedJoin(li, supRenamed, "l_suppkey", n = 8)
      .groupBy("s_name").agg(round(sum("l_quantity"), 2).as("q"))
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
    assert(salted.count() > 0)
  }

  test("saltedAgg two-level collect equals direct grouping") {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d")).toDF("k", "v")
    val direct = df.groupBy("k").agg(sort_array(collect_list("v")).as("vs"))
    val salted = Skew.saltedAgg(df, "k", n = 4,
      partial = Seq(collect_list(col("v")).as("vs_part")),
      finalAgg = Seq(sort_array(flatten(collect_list(col("vs_part")))).as("vs")))
    assert(direct.exceptAll(salted).isEmpty && salted.exceptAll(direct).isEmpty)
  }

  test("salt is deterministic across evaluations (retry-safe)") {
    val li = Tables.lineitem(spark, sf())
    val a = Skew.saltedJoin(li,
      Tables.supplier(spark, sf()).select(col("s_suppkey").as("l_suppkey"), col("s_name")),
      "l_suppkey", 8).count()
    val b = Skew.saltedJoin(li,
      Tables.supplier(spark, sf()).select(col("s_suppkey").as("l_suppkey"), col("s_name")),
      "l_suppkey", 8).count()
    assert(a == b && a == li.count()) // inner join keeps every lineitem row
  }

  private def plainSessions(ev: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = unix_micros(col("ts")) -
      unix_micros(lag(col("ts"), 1).over(byUser))
    val newSession =
      when(gapUs.isNull || gapUs > 30L * 60 * 1000000, 1L).otherwise(0L)
    ev.withColumn("session_idx", sum(newSession)
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .as("dur_us"))
  }

  test("sessionizeBucketed equals the plain per-user window, any bucket width") {
    val ev = Tables.events(spark, sf())
    val plain = plainSessions(ev)
    // 7 min (< gap, many bridges) and 120 min: labeling must be
    // bucket-width-invariant
    for (bm <- Seq(7, 120)) {
      val bucketed = Skew.sessionizeBucketed(ev, "user_id", "ts", "event_id",
        gapMinutes = 30, bucketMinutes = bm)
      assert(plain.exceptAll(bucketed).isEmpty &&
        bucketed.exceptAll(plain).isEmpty, s"bucketMinutes=$bm")
    }
  }

  test("sessionizeBucketed bridges sessions across empty buckets") {
    // user 1: events at t=0 and t=25min with 10-min buckets — the
    // session spans buckets 0 and 2 with bucket 1 empty; gap 25 <= 30
    // so ONE session. user 2: 40-min gap -> two sessions.
    val ev = Seq((1L, 0L, 10L), (2L, 25L, 10L), (3L, 0L, 12L),
        (4L, 40L, 12L))
      .toDF("event_id", "min", "user_id")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("min") * 60 * 1000000).as("ts"))
    val got = Skew.sessionizeBucketed(ev, "user_id", "ts", "event_id",
        gapMinutes = 30, bucketMinutes = 10)
      .select("user_id", "session_idx", "n_events", "dur_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 1L, 2L, 25L * 60 * 1000000),
      (12L, 1L, 1L, 0L), (12L, 2L, 1L, 0L)), s"got=$got")
  }

  test("rollingBucketed equals the plain RANGE window (rounded sums)") {
    val ev = Tables.events(spark, sf())
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600L * 1000 * 1000, 0)
    val plain = ev.select(col("event_id"), col("user_id"),
      count(lit(1)).over(w).as("n_1h"),
      round(sum(col("value")).over(w), 2).as("sum_1h"))
    val bucketed = Skew.rollingBucketed(ev, "user_id", "ts", "event_id",
        "value", rangeUs = 3600L * 1000 * 1000)
      .select(col("event_id"), col("user_id"), col("n").as("n_1h"),
        round(col("s"), 2).as("sum_1h"))
    assert(plain.exceptAll(bucketed).isEmpty &&
      bucketed.exceptAll(plain).isEmpty)
    assert(bucketed.count() == ev.count())
  }
}

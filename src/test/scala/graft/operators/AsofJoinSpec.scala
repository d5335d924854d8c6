package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  // probe: (key, t, label); build: (key, t, value)
  private def probe = Seq(
    ("a", 10L, "p1"), ("a", 20L, "p2"), ("a", 5L, "p0"),
    ("b", 15L, "p3"), ("c", 7L, "p4")
  ).toDF("k", "t", "label")

  private def build = Seq(
    ("a", 10L, 1.0), ("a", 18L, 2.0), ("a", 30L, 3.0),
    ("b", 1L, 4.0), ("b", 15L, 5.0)
  ).toDF("k", "bt", "v")

  test("inner as-of: latest build at-or-before each probe time, inclusive") {
    val out = AsofJoin.asof(probe, build, "k", "t", "bt",
      payload = Seq("v"), buildTimeAs = Some("matched_t"))
      .orderBy($"k", $"t")
      .as[(String, Long, String, Double, Long)].collect()
    assert(out === Seq(
      ("a", 10L, "p1", 1.0, 10L), // equal time matches (inclusive)
      ("a", 20L, "p2", 2.0, 18L), // latest preceding, not the 30L one
      ("b", 15L, "p3", 5.0, 15L)))
    // a@5 (before any build) and c@7 (no build key) dropped by inner
  }

  test("left as-of keeps unmatched probe rows with null payload") {
    val out = AsofJoin.asof(probe, build, "k", "t", "bt",
      payload = Seq("v"), inner = false)
      .orderBy($"k", $"t").collect()
    assert(out.length === probe.count())
    val unmatched = out.filter(r => r.isNullAt(3)).map(r => (r.getString(0), r.getLong(1)))
    assert(unmatched.toSeq === Seq(("a", 5L), ("c", 7L)))
  }

  test("single shuffle: exactly one Exchange in the physical plan") {
    val df = AsofJoin.asof(probe, build, "k", "t", "bt", payload = Seq("v"))
    df.collect()
    val shuffles = collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.size === 1, df.queryExecution.executedPlan.toString)
  }

  test("salted variant equals plain asof at every bucket width (inner + left)") {
    for (w <- Seq(1L, 3L, 7L, 100L); in <- Seq(true, false)) {
      val plain = AsofJoin.asof(probe, build, "k", "t", "bt",
          payload = Seq("v"), buildTimeAs = Some("mt"), inner = in)
        .orderBy($"k", $"t").collect().toSeq
      val salted = AsofJoin.asofSalted(probe, build, "k", "t", "bt",
          payload = Seq("v"), bucketWidth = w, buildTimeAs = Some("mt"), inner = in)
        .orderBy($"k", $"t").collect().toSeq
      assert(salted === plain, s"bucketWidth=$w inner=$in")
    }
  }

  test("salted variant on a dominant key: correct across bucket boundaries") {
    // one key holds everything; builds sparse, probes dense — most
    // probes must reach back across several empty buckets
    val hotBuild = (0 until 10).map(i => ("hot", i * 50L, i.toDouble)).toDF("k", "bt", "v")
    val hotProbe = (0 until 500).map(i => ("hot", i.toLong, s"p$i")).toDF("k", "t", "label")
    val plain = AsofJoin.asof(hotProbe, hotBuild, "k", "t", "bt", payload = Seq("v"))
      .orderBy($"t").as[(String, Long, String, Double)].collect().toSeq
    val salted = AsofJoin.asofSalted(hotProbe, hotBuild, "k", "t", "bt",
        payload = Seq("v"), bucketWidth = 7L)
      .orderBy($"t").as[(String, Long, String, Double)].collect().toSeq
    assert(salted === plain)
    // spot-check the semantics themselves: probe t=123 → build at 100 (v=2)
    assert(plain.find(_._2 == 123L).get._4 === 2.0)
  }

  test("salted plan runs the phase-1 carry-forward window exactly once (ADVICE r4)") {
    // probe buckets used to be enumerated FROM the phase-1 output, so
    // the full-data windowed carry-forward subtree appeared twice in
    // the plan and ran twice; they now come from the pre-window frame.
    // Plan shape: one window over (__k, __bk) [phase 1], one over (__k)
    // [bucket boundary] — exactly two WindowExec nodes, not three.
    val df = AsofJoin.asofSalted(probe, build, "k", "t", "bt",
      payload = Seq("v"), bucketWidth = 7L)
    df.collect()
    val windows = collectWithSubqueries(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size === 2,
      s"expected 2 windows (phase-1 + boundary):\n${df.queryExecution.executedPlan}")
    val twoKey = windows.count(_.partitionSpec.size == 2)
    assert(twoKey === 1, "phase-1 (__k, __bk) window must appear exactly once")
  }

  test("payload name collision with probe columns is rejected") {
    intercept[IllegalArgumentException] {
      AsofJoin.asof(probe, build.withColumnRenamed("v", "label"),
        "k", "t", "bt", payload = Seq("label"))
    }
  }

  test("matches the explode-and-prune reference formulation") {
    // reference: equi-join on key + time inequality, keep max build time
    val ref = probe.as("p").join(build.as("b"),
        $"p.k" === $"b.k" && $"p.t" >= $"b.bt")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"p.k", $"p.t", $"p.label")
          .orderBy($"b.bt".desc)))
      .filter($"rn" === 1)
      .select($"p.k", $"p.t", $"p.label", $"b.v", $"b.bt".as("matched_t"))
      .orderBy($"p.k", $"p.t")
    val out = AsofJoin.asof(probe, build, "k", "t", "bt",
        payload = Seq("v"), buildTimeAs = Some("matched_t"))
      .orderBy($"k", $"t")
    assert(out.collect().toSeq === ref.collect().toSeq)
  }
}

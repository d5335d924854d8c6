package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    ("a", 5L), ("a", 10L), ("a", 99L), ("a", 100L), ("a", 250L),
    ("b", 10L), ("c", 10L)
  ).toDF("k", "t")

  private def intervals = Seq(
    ("a", 0L, 99L, "i1"),     // spans bins 0..9 at width 10
    ("a", 100L, 100L, "i2"),  // degenerate single-point interval
    ("a", 90L, 110L, "i3"),   // overlaps i1 and i2
    ("b", 500L, 600L, "i4"),  // no points inside
    ("d", 0L, 50L, "i5")      // key with no points
  ).toDF("k", "lo", "hi", "iv")

  test("containment matches, inclusive bounds, overlapping intervals, no dup pairs") {
    val out = RangeJoin.pointInInterval(points, intervals, "k", "t", "lo", "hi", 10L)
      .select($"k", $"t", $"iv").as[(String, Long, String)].collect().toSet
    assert(out === Set(
      ("a", 5L, "i1"), ("a", 10L, "i1"), ("a", 99L, "i1"),
      ("a", 99L, "i3"), ("a", 100L, "i3"), ("a", 100L, "i2")))
  }

  test("bin width does not change the result, only the plan") {
    val r = (w: Long) => RangeJoin.pointInInterval(points, intervals, "k", "t", "lo", "hi", w)
      .select($"k", $"t", $"iv").as[(String, Long, String)].collect().toSet
    assert(r(1L) === r(10L))
    assert(r(1000L) === r(10L)) // one giant bin still exact (just more candidates)
  }

  test("matches the naive inequality-join formulation") {
    val naive = points.as("p").join(intervals.as("i"),
        $"p.k" === $"i.k" && $"p.t" >= $"i.lo" && $"p.t" <= $"i.hi")
      .select($"p.k", $"p.t", $"i.iv").as[(String, Long, String)].collect().toSet
    val binned = RangeJoin.pointInInterval(points, intervals, "k", "t", "lo", "hi", 7L)
      .select($"k", $"t", $"iv").as[(String, Long, String)].collect().toSet
    assert(binned === naive)
  }

  test("negative coordinates bin by FLOOR, matches the naive join") {
    // truncation-style division would bin -5 and 5 together and can
    // drop a true pair at a negative boundary; pmod-floor must not
    val negPoints = Seq(("a", -25L), ("a", -10L), ("a", -1L), ("a", 0L))
      .toDF("k", "t")
    val negIntervals = Seq(("a", -30L, -10L, "n1"), ("a", -5L, 5L, "n2"))
      .toDF("k", "lo", "hi", "iv")
    val naive = negPoints.as("p").join(negIntervals.as("i"),
        $"p.k" === $"i.k" && $"p.t" >= $"i.lo" && $"p.t" <= $"i.hi")
      .select($"p.k", $"p.t", $"i.iv").as[(String, Long, String)].collect().toSet
    for (w <- Seq(1L, 7L, 10L, 100L)) {
      val binned = RangeJoin.pointInInterval(negPoints, negIntervals,
          "k", "t", "lo", "hi", w)
        .select($"k", $"t", $"iv").as[(String, Long, String)].collect().toSet
      assert(binned === naive, s"width=$w")
    }
  }

  test("colliding interval column names are rejected") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, intervals.withColumnRenamed("iv", "t"),
        "k", "t", "lo", "hi", 10L)
    }
  }

  test("plan is a shuffle equi-join, not a nested loop") {
    val df = RangeJoin.pointInInterval(points, intervals, "k", "t", "lo", "hi", 10L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }
}

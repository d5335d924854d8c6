package graft.functions

import graft.SparkSpec
import graft.operators.GeoJoin
import org.apache.spark.sql.functions._

/** The [[PointInRing]] kernel against the Scala reference
  * ([[GeoJoin.pointInRing]]) — bit-identical verdicts on random convex,
  * concave, and star rings; codegen path == interpreted path; and the
  * plan property the kernel exists for: the pointsInPolygons verify
  * filter sits INSIDE a whole-stage-codegen span (the round-15 UDF
  * broke the span at exactly the hot per-row chain).
  */
class RayCastSpec extends SparkSpec {

  private def closed(ps: Seq[(Double, Double)]): Seq[(Double, Double)] =
    ps :+ ps.head

  private def randomRing(rnd: scala.util.Random): Seq[(Double, Double)] = {
    val cx = rnd.nextDouble() * 20 - 10
    val cy = rnd.nextDouble() * 20 + 35
    val k = 3 + rnd.nextInt(9)
    // star polygon: random radius per spoke — concave most of the time
    closed((0 until k).map { j =>
      val a = 2 * math.Pi * j / k
      val r = 0.2 + rnd.nextDouble() * 2.0
      (cx + r * math.cos(a), cy + r * math.sin(a))
    })
  }

  test("kernel == GeoJoin.pointInRing on random star rings; " +
      "codegen == interpreted") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val rings = (1 to 25).map(i => (i.toLong, randomRing(rnd)))
    val pts = (1 to 400).map(i =>
      (i.toLong, rnd.nextDouble() * 26 - 13, rnd.nextDouble() * 26 + 32))
    val df = pts.toDF("pid", "lon", "lat").crossJoin(
      rings.toDF("gid", "rawring").select($"gid",
        expr("transform(rawring, p -> struct(p._1 AS lon, p._2 AS lat))")
          .as("ring")))
    def run(): Set[(Long, Long)] = df
      .filter(GeoFunctions.point_in_ring($"lon", $"lat", $"ring"))
      .select($"pid", $"gid").as[(Long, Long)].collect().toSet
    val want = (for {
      p <- pts; g <- rings
      if GeoJoin.pointInRing(p._2, p._3, g._2)
    } yield (p._1, g._1)).toSet
    val gotCodegen = run()
    assert(gotCodegen == want,
      s"missing=${(want -- gotCodegen).take(5)} " +
        s"extra=${(gotCodegen -- want).take(5)} n=${want.size}")
    assert(want.nonEmpty && want.size < pts.size * rings.size)
    // interpreted path (CODEGEN_ONLY off): identical verdicts
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(run() == want)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null lon / null ring yield null (row filtered), not a crash; " +
      "degenerate rings (< 2 points) are outside") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(0.5), Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0),
        (0.0, 0.0))),
      (2L, None, Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0),
        (0.0, 0.0))),
      (3L, Some(0.5), Seq.empty[(Double, Double)]),
      (4L, Some(0.5), Seq((0.25, 0.25))))
      .toDF("id", "lon", "rawring")
      .select($"id", $"lon", lit(0.5).as("lat"),
        expr("transform(rawring, p -> struct(p._1 AS lon, p._2 AS lat))")
          .as("ring"))
    val got = df.filter(GeoFunctions.point_in_ring($"lon", $"lat", $"ring"))
      .select($"id").as[Long].collect().toSet
    assert(got == Set(1L), s"got=$got")
  }

  test("pointsInPolygons verify runs INSIDE whole-stage codegen " +
      "(the kernel's reason to exist)") {
    import spark.implicits._
    val pts = (1 to 50).map(i => (i.toLong, i * 0.01, 45.0 + i * 0.01))
      .toDF("id", "lon", "lat")
    val polys = Seq((1L, closed(Seq((0.0, 44.9), (0.6, 44.9), (0.6, 45.8),
        (0.0, 45.8)))))
      .toDF("gid", "rawring").select($"gid",
        expr("transform(rawring, p -> struct(p._1 AS lon, p._2 AS lat))")
          .as("ring"))
    val df = GeoJoin.pointsInPolygons(pts, polys, "id", "lon", "lat",
      "gid", "ring", cellDeg = 0.5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the node carrying the kernel (a Filter, or the join condition it
    // gets pushed into) must be codegen'd: its plan line wears the
    // *(n) whole-stage marker. In practice the kernel fuses INTO the
    // BroadcastHashJoin condition — the verify never even materializes
    // an intermediate row.
    val line = plan.linesIterator.find(_.contains("graft_point_in_ring"))
    assert(line.isDefined, plan.take(1200))
    assert(line.get.trim.stripPrefix("+- ").startsWith("*("), line.get)
    // and no BatchEvalPython / interpreted-UDF stage anywhere
    assert(!plan.contains("BatchEval") && !plan.contains("ScalaUDF"),
      plan.take(1200))
  }
}

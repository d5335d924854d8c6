package graft.functions

import graft.SparkSpec
import graft.operators.GeoJoin
import org.apache.spark.sql.functions._

/** The [[RingsIntersect]] kernel against a Scala reference mirror —
  * hand geometries covering every branch (strict crossing with no
  * vertex containment, containment both ways, bbox-overlap-but-
  * disjoint concave notch, disjoint), random star-ring pairs, and
  * codegen == interpreted.
  */
class RingsIntersectSpec extends SparkSpec {

  private def closed(ps: Seq[(Double, Double)]): Seq[(Double, Double)] =
    ps :+ ps.head

  private def crossVal(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double): Double =
    (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  /** Mirror of RingsIntersect.intersects over Scala Seqs. */
  private def ref(a: Seq[(Double, Double)],
      b: Seq[(Double, Double)]): Boolean = {
    val edgeCross = a.sliding(2).exists(ea => b.sliding(2).exists { eb =>
      val o1 = crossVal(ea(0)._1, ea(0)._2, ea(1)._1, ea(1)._2,
        eb(0)._1, eb(0)._2)
      val o2 = crossVal(ea(0)._1, ea(0)._2, ea(1)._1, ea(1)._2,
        eb(1)._1, eb(1)._2)
      val o3 = crossVal(eb(0)._1, eb(0)._2, eb(1)._1, eb(1)._2,
        ea(0)._1, ea(0)._2)
      val o4 = crossVal(eb(0)._1, eb(0)._2, eb(1)._1, eb(1)._2,
        ea(1)._1, ea(1)._2)
      o1 * o2 < 0 && o3 * o4 < 0
    })
    edgeCross || GeoJoin.pointInRing(a.head._1, a.head._2, b) ||
      GeoJoin.pointInRing(b.head._1, b.head._2, a)
  }

  private def toDf(pairs: Seq[(Long, Seq[(Double, Double)], Long,
      Seq[(Double, Double)])]) = {
    import spark.implicits._
    pairs.toDF("ia", "rawa", "ib", "rawb").select($"ia", $"ib",
      expr("transform(rawa, p -> struct(p._1 AS lon, p._2 AS lat))").as("ra"),
      expr("transform(rawb, p -> struct(p._1 AS lon, p._2 AS lat))").as("rb"))
  }

  test("hand geometries: plus-sign crossing (no vertices inside), " +
      "containment both ways, concave-notch bbox trap, disjoint") {
    import spark.implicits._
    val wideFlat = closed(Seq((0.0, 4.0), (10.0, 4.0), (10.0, 6.0), (0.0, 6.0)))
    val tallThin = closed(Seq((4.0, 0.0), (6.0, 0.0), (6.0, 10.0), (4.0, 10.0)))
    val big = closed(Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)))
    val small = closed(Seq((3.0, 3.0), (4.0, 3.0), (4.0, 4.0), (3.0, 4.0)))
    // C-shape whose bbox CONTAINS the probe square, but whose region
    // does not touch it (the square sits in the notch)
    val cShape = closed(Seq((0.0, 0.0), (10.0, 0.0), (10.0, 2.0), (2.0, 2.0),
      (2.0, 8.0), (10.0, 8.0), (10.0, 10.0), (0.0, 10.0)))
    val inNotch = closed(Seq((5.0, 4.0), (7.0, 4.0), (7.0, 6.0), (5.0, 6.0)))
    val faraway = closed(Seq((50.0, 50.0), (51.0, 50.0), (51.0, 51.0),
      (50.0, 51.0)))
    val cases = Seq(
      (1L, wideFlat, 2L, tallThin, true),   // plus: crossings only
      (3L, big, 4L, small, true),           // b inside a
      (5L, small, 6L, big, true),           // a inside b
      (7L, cShape, 8L, inNotch, false),     // bbox overlap, regions apart
      (9L, big, 10L, faraway, false))
    val got = toDf(cases.map(c => (c._1, c._2, c._3, c._4)))
      .select($"ia", GeoFunctions.rings_intersect($"ra", $"rb").as("x"))
      .as[(Long, Boolean)].collect().toMap
    cases.foreach { c =>
      assert(got(c._1) == c._5, s"case ${c._1}: got ${got(c._1)}")
      assert(ref(c._2, c._4) == c._5, s"ref disagrees on case ${c._1}")
    }
  }

  test("random star-ring pairs: kernel == reference mirror; " +
      "codegen == interpreted; symmetric") {
    import spark.implicits._
    val rnd = new scala.util.Random(1717)
    def star(): Seq[(Double, Double)] = {
      val cx = rnd.nextDouble() * 12 - 6; val cy = rnd.nextDouble() * 12 + 40
      val k = 3 + rnd.nextInt(8)
      closed((0 until k).map { j =>
        val ang = 2 * math.Pi * j / k
        val r = 0.3 + rnd.nextDouble() * 2.5
        (cx + r * math.cos(ang), cy + r * math.sin(ang))
      })
    }
    val rings = (1 to 40).map(i => (i.toLong, star()))
    val pairs = for { a <- rings; b <- rings if a._1 < b._1 }
      yield (a._1, a._2, b._1, b._2)
    val df = toDf(pairs)
    def run(): Set[(Long, Long)] = df
      .filter(GeoFunctions.rings_intersect($"ra", $"rb"))
      .select($"ia", $"ib").as[(Long, Long)].collect().toSet
    val want = pairs.filter(p => ref(p._2, p._4)).map(p => (p._1, p._3)).toSet
    val gotCodegen = run()
    assert(gotCodegen == want,
      s"missing=${(want -- gotCodegen).take(5)} " +
        s"extra=${(gotCodegen -- want).take(5)} n=${want.size}")
    assert(want.nonEmpty && want.size < pairs.size)
    // symmetry: swapped operands give the same verdicts
    val swapped = df.filter(GeoFunctions.rings_intersect($"rb", $"ra"))
      .select($"ia", $"ib").as[(Long, Long)].collect().toSet
    assert(swapped == gotCodegen)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == want)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}

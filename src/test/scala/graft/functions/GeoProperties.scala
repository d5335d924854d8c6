package graft.functions

import graft.functions.GeoFunctions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the pure geometry/compat kernels
  * (SURVEY.md §5.3): WKB round-trips, centroid-inside-bbox, area
  * positivity/monotonicity, sanitize identity, hstore round-trip.
  */
object GeoProperties extends Properties("graft.geo") {

  private val lonGen = Gen.chooseNum(-179.0, 179.0)
  private val latGen = Gen.chooseNum(-85.0, 85.0)
  private val sideGen = Gen.chooseNum(1e-4, 0.5)

  property("wkbPoint round-trips") = forAll(lonGen, latGen) { (lon, lat) =>
    decodePoint(wkbPointBytes(lon, lat)) == ((lon, lat))
  }

  private val ringGen: Gen[Seq[(Double, Double)]] = for {
    n <- Gen.chooseNum(3, 12)
    pts <- Gen.listOfN(n, Gen.zip(lonGen, latGen))
  } yield pts :+ pts.head

  property("wkbMultiPolygon round-trips closed rings") = forAll(ringGen) { ring =>
    decodeMultiPolygon(wkbMultiPolygonBytes(Seq(ring))) == Seq(Seq(ring))
  }

  property("rectangle centroid = midpoint, inside bbox") =
    forAll(lonGen, latGen, sideGen, sideGen) { (lon, lat, w, h) =>
      val ring = Seq((lon, lat), (lon + w, lat), (lon + w, lat + h),
        (lon, lat + h), (lon, lat))
      val (cx, cy) = centroidLonLat(ring).get
      math.abs(cx - (lon + w / 2)) < 1e-9 && math.abs(cy - (lat + h / 2)) < 1e-9 &&
        cx >= lon && cx <= lon + w && cy >= lat && cy <= lat + h
    }

  property("geodesic area non-negative; grows with side for squares") =
    forAll(lonGen, Gen.chooseNum(-60.0, 60.0), Gen.chooseNum(1e-4, 0.2)) {
      (lon, lat, d) =>
        def sq(s: Double) = Seq((lon, lat), (lon + s, lat), (lon + s, lat + s),
          (lon, lat + s), (lon, lat))
        val a1 = geodesicAreaM2(sq(d)).get
        val a2 = geodesicAreaM2(sq(2 * d)).get
        a1 >= 0.0 && a2 > a1
    }

  property("ring orientation does not change area or centroid") =
    forAll(lonGen, latGen, sideGen) { (lon, lat, d) =>
      val cw = Seq((lon, lat), (lon, lat + d), (lon + d, lat + d),
        (lon + d, lat), (lon, lat))
      val ccw = cw.reverse
      geodesicAreaM2(cw) == geodesicAreaM2(ccw) &&
        centroidLonLat(cw).get._1 - centroidLonLat(ccw).get._1 < 1e-12
    }

  private val safeWord: Gen[String] =
    Gen.resize(12, Gen.nonEmptyListOf(Gen.alphaNumChar)).map(_.mkString)

  property("hstore serialize → parse round-trips safe maps") =
    forAll(Gen.resize(6, Gen.nonEmptyListOf(Gen.zip(safeWord, safeWord)))) { kvs =>
      val m = kvs.toMap
      val ser = m.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k"=>"$v"""" }.mkString(",")
      HstoreCompat.parseHstoreString(ser) == m
    }

  property("parse inverts the C1 quote/backslash-pair escapes") =
    forAll(safeWord) { base =>
      val tricky = base + "\"q\\\\p\tx"
      // serialize via the same chain the engine uses (pure mirror)
      val sanitized = tricky
        .replace("\\\\", "\\\\\\\\").replace("\"", "\\\\\"")
        .replace("\n\r", "\\\\r").replace("\n", "\\\\r")
        .replace("\r", "\\\\r").replace("\t", "\\\\t")
      val parsed = HstoreCompat.parseHstoreString(s""""k"=>"$sanitized"""")
      parsed("k") == tricky
    }
}

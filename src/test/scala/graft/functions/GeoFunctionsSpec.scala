package graft.functions

import graft.SparkSpec
import graft.functions.GeoFunctions._

/** Byte-level and hand-computed goldens for C3/C4/C8/C9 (FIXTURES.md
  * §A4).
  */
class GeoFunctionsSpec extends SparkSpec {

  private val unitSquare = Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0))

  test("C3: WKB point byte-level golden") {
    val wkb = wkbPointBytes(2.0, 3.0)
    assert(wkb.length == 21)
    // little-endian marker, type=1
    assert(wkb(0) == 1 && wkb(1) == 1 && wkb(2) == 0 && wkb(3) == 0 && wkb(4) == 0)
    assert(decodePoint(wkb) == ((2.0, 3.0)))
    // known bytes for (2.0, 3.0): doubles 0x4000... and 0x4008...
    assert(wkb(12) == 0x40.toByte && wkb(20) == 0x40.toByte && wkb(19) == 0x08.toByte)
  }

  test("C4: WKB multipolygon round-trips; invalid rings are null (F6)") {
    val wkb = wkbMultiPolygonBytes(Seq(unitSquare))
    assert(decodeMultiPolygon(wkb) == Seq(Seq(unitSquare)))
    assert(wkbMultiPolygonBytes(Seq(unitSquare.dropRight(1))) == null) // unclosed
    assert(wkbMultiPolygonBytes(Seq(Seq((0.0, 0.0), (1.0, 0.0), (0.0, 0.0)))) == null) // <4 pts
    assert(wkbMultiPolygonBytes(Nil) == null)
  }

  test("C4 holes: multi-ring multipolygon round-trips exterior + interior") {
    val hole = Seq((0.25, 0.25), (0.75, 0.25), (0.75, 0.75), (0.25, 0.75), (0.25, 0.25))
    val wkb = wkbMultiPolygonBytes(Seq(unitSquare, hole))
    assert(wkb.length == 22 + (4 + 16 * 5) * 2)
    assert(decodeMultiPolygon(wkb) == Seq(Seq(unitSquare, hole)))
    assert(wkbMultiPolygonBytes(Seq(unitSquare, hole.dropRight(1))) == null)
  }

  test("linestring WKB: byte-level golden, open + closed, < 2 pts null") {
    val path = Seq((2.0, 3.0), (4.0, 5.0), (6.0, 7.0))
    val wkb = wkbLineStringBytes(path)
    assert(wkb.length == 9 + 16 * 3)
    // little-endian marker, type=2, count=3
    assert(wkb(0) == 1 && wkb(1) == 2 && wkb(2) == 0 && wkb(3) == 0 && wkb(4) == 0)
    assert(wkb(5) == 3 && wkb(6) == 0)
    assert(decodeLineString(wkb) == path)
    assert(decodeLineString(wkbLineStringBytes(unitSquare)) == unitSquare)
    assert(wkbLineStringBytes(Seq((1.0, 1.0))) == null)
    assert(wkbLineStringBytes(null) == null)
  }

  test("C8: shoelace centroid — square, triangle, far-from-origin precision") {
    assert(centroidLonLat(unitSquare).get == ((0.5, 0.5)))
    val tri = Seq((0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (0.0, 0.0))
    val (cx, cy) = centroidLonLat(tri).get
    assert(math.abs(cx - 1.0) < 1e-12 && math.abs(cy - 1.0) < 1e-12)
    // tiny square at large coordinates: translation must preserve precision
    val d = 0.001
    val far = Seq((149.37, -59.0), (149.37 + d, -59.0), (149.37 + d, -59.0 + d),
      (149.37, -59.0 + d), (149.37, -59.0))
    val (fx, fy) = centroidLonLat(far).get
    assert(math.abs(fx - (149.37 + d / 2)) < 1e-10, s"fx=$fx")
    assert(math.abs(fy - (-59.0 + d / 2)) < 1e-10, s"fy=$fy")
    assert(centroidLonLat(Seq((0.0, 0.0), (1.0, 1.0), (0.0, 0.0))) == None)
  }

  test("C9: spherical area — equator unit square vs closed form, hemisphere sanity") {
    // closed form for a lon/lat-aligned square: R²/2·|Δλ|·|2sinφ₁-2sinφ₂|... via formula
    val a = geodesicAreaM2(unitSquare).get
    // 1°×1° at equator ≈ (111.32 km)² ≈ 1.2392e10 m²
    assert(math.abs(a - 1.2392e10) / 1.2392e10 < 1e-3, s"a=$a")
    // small square: ~12390 m² for 0.001° at equator
    val d = 0.001
    val small = Seq((10.0, 0.0), (10.0 + d, 0.0), (10.0 + d, d), (10.0, d), (10.0, 0.0))
    val s = geodesicAreaM2(small).get
    assert(math.abs(s - 12392.0) / 12392.0 < 1e-2, s"s=$s")
    assert(geodesicAreaM2(Seq((0.0, 0.0))) == None)
  }

  test("C9/F8: the 20000 m² threshold separates the testdata way classes") {
    val d1 = 0.001
    val big = 0.1
    for (lat <- Seq(-60.0, -30.0, 0.0, 30.0, 59.0)) {
      val small = Seq((0.0, lat), (d1, lat), (d1, lat + d1), (0.0, lat + d1), (0.0, lat))
      val large = Seq((0.0, lat), (big, lat), (big, lat + big), (0.0, lat + big), (0.0, lat))
      assert(geodesicAreaM2(small).get <= 20000.0)
      assert(geodesicAreaM2(large).get > 20000.0)
    }
  }

  /** Exact WGS84 ellipsoid area of a lon/lat-aligned rectangle:
    * A = Δλ · a² · (q(φ₂) − q(φ₁)) / 2 with Snyder's authalic q —
    * the independent truth the spheroid function is judged against.
    */
  private def ellipsoidRectAreaM2(dLonDeg: Double, lat1: Double, lat2: Double): Double = {
    val e2 = 0.00669437999014132
    val e = math.sqrt(e2)
    def q(latDeg: Double): Double = {
      val s = math.sin(math.toRadians(latDeg))
      (1 - e2) * (s / (1 - e2 * s * s) +
        math.log((1 + e * s) / (1 - e * s)) / (2 * e))
    }
    math.toRadians(dLonDeg) * EarthRadiusM * EarthRadiusM * (q(lat2) - q(lat1)) / 2
  }

  private def rect(lon0: Double, lat0: Double, dLon: Double, dLat: Double) =
    Seq((lon0, lat0), (lon0 + dLon, lat0), (lon0 + dLon, lat0 + dLat),
      (lon0, lat0 + dLat), (lon0, lat0))

  test("C9 spheroid: within 0.05% of the closed-form ellipsoid area; spherical is not") {
    for (lat <- Seq(-59.0, -30.0, 0.0, 22.5, 45.0, 60.0); d <- Seq(0.001, 0.01, 0.1)) {
      val ring = rect(12.3, lat, d, d)
      val truth = ellipsoidRectAreaM2(d, lat, lat + d)
      val sph = geodesicAreaSpheroidM2(ring).get
      assert(math.abs(sph - truth) / truth < 5e-4,
        s"lat=$lat d=$d spheroid=$sph truth=$truth")
    }
    // the plain spherical value misses the ellipsoid truth (worst near
    // the equator, ~0.67%, where the radius and latitude biases don't
    // cancel — they nearly do around |lat| ≈ 45°)
    val ring = rect(12.3, 0.0, 0.01, 0.01)
    val truth = ellipsoidRectAreaM2(0.01, 0.0, 0.01)
    val sphere = geodesicAreaM2(ring).get
    assert(math.abs(sphere - truth) / truth > 5e-4, s"sphere=$sphere truth=$truth")
    assert(geodesicAreaSpheroidM2(Seq((0.0, 0.0))) == None)
  }

  test("F8 spheroid: 20000 m² boundary polygons classify as PostGIS would") {
    // rectangles sized to straddle the threshold by ±0.1% TRUE area at
    // the equator: spheroid classification must match the truth; the
    // sphere (radius a, no flattening correction: ~+0.67% there)
    // misclassifies the just-under ring — exactly the boundary drift
    // this option removes
    val lat = 0.0
    val unit = ellipsoidRectAreaM2(0.001, lat, lat + 0.001) // per (0.001°)²
    def ringOfArea(target: Double) = {
      val scale = math.sqrt(target / unit)
      val d = 0.001 * scale
      (rect(7.0, lat, d, d), ellipsoidRectAreaM2(d, lat, lat + d))
    }
    val (under, underTruth) = ringOfArea(19980.0)
    val (over, overTruth) = ringOfArea(20020.0)
    assert(underTruth <= 20000.0 && overTruth > 20000.0) // construction sanity
    assert(geodesicAreaSpheroidM2(under).get <= 20000.0)
    assert(geodesicAreaSpheroidM2(over).get > 20000.0)
    assert(geodesicAreaM2(under).get > 20000.0,
      "spherical should misclassify the just-under ring (+0.22% radius bias)")
  }

  test("C9 spheroid: edge-treatment sensitivity measured — axis-aligned " +
      "edges exact, diagonal edges ~ tan(lat)·Δφ/8 relative") {
    // The documented residual vs PostGIS/GeographicLib is EDGE
    // DEFINITION (geodesic arcs vs linear-in-(λ, sin φ) trapezoids).
    // Its magnitude is bounded by how much the trapezoid value moves
    // under midpoint subdivision. Measured scaling law: lat/lon-
    // aligned edges are EXACT (constant-lat edges have no sin
    // nonlinearity, constant-lon edges contribute 0), and a diagonal
    // edge's relative shift is ≈ tan(φ̄)·Δφ_edge/8 (φ̄ the ring's mid-latitude) — independent of
    // polygon SIZE (absolute error Δλ·Δφ²·sinφ/8 over area Δλ·Δφ·cosφ).
    // For a building-sized diagonal (Δφ ≈ 0.001° = 1.75e-5 rad) at
    // lat 45 that is ~2.2e-6 relative — ~0.04 m² on a 20,000 m²
    // threshold polygon, two orders below the 0.05% closed-form
    // tolerance above, supporting "negligible for OSM-building-sized
    // rings". Degree-sized diagonals reach ~tan(φ)·0.0175/8 ≈ 2e-3 at
    // lat 45 — the size class where only a geodesic integrator closes
    // the gap (SURVEY §7.4's documented residual).
    def subdivide(ring: Seq[(Double, Double)]): Seq[(Double, Double)] =
      ring.sliding(2).flatMap { case Seq((x1, y1), (x2, y2)) =>
        Seq((x1, y1), ((x1 + x2) / 2, (y1 + y2) / 2))
      }.toSeq :+ ring.last
    def tri(lon0: Double, lat0: Double, d: Double) =
      Seq((lon0, lat0), (lon0 + d, lat0), (lon0 + d / 2, lat0 + d),
        (lon0, lat0))
    for (lat <- Seq(0.0, 45.0, 60.0)) {
      val building = 0.001 // ~100 m
      val rectRel = {
        val r = rect(12.3, lat, building, building)
        val a = geodesicAreaSpheroidM2(r).get
        math.abs(geodesicAreaSpheroidM2(subdivide(r)).get - a) / a
      }
      assert(rectRel < 1e-9, s"lat=$lat axis-aligned ring moved $rectRel")
      val law = math.tan(math.toRadians(lat + building / 2)) *
        math.toRadians(building) / 8 + 1e-9
      val triRel = {
        val t = tri(12.3, lat, building)
        val a = geodesicAreaSpheroidM2(t).get
        math.abs(geodesicAreaSpheroidM2(subdivide(t)).get - a) / a
      }
      assert(triRel < 2 * law,
        s"lat=$lat diagonal ring moved $triRel vs law $law")
      val bigLaw = math.tan(math.toRadians(lat + 0.5)) *
        math.toRadians(1.0) / 8 + 1e-9
      val bigRel = {
        val t = tri(12.3, lat, 1.0)
        val a = geodesicAreaSpheroidM2(t).get
        math.abs(geodesicAreaSpheroidM2(subdivide(t)).get - a) / a
      }
      assert(bigRel < 2 * bigLaw,
        s"lat=$lat degree-sized ring moved $bigRel vs law $bigLaw")
    }
  }
}

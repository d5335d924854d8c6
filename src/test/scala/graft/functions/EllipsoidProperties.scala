package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the exact ellipsoidal solvers — the
  * algebraic laws a correct geodesic implementation cannot avoid,
  * exercised over random geometry rather than hand-picked fixtures:
  * invariances (longitude shift, equator mirror, reversal), triangle
  * additivity along a shared geodesic diagonal, metric axioms for the
  * distance, and agreement bounds against the authalic/haversine
  * approximations.
  */
object EllipsoidProperties extends Properties("graft.ellipsoid") {

  private def rel(a: Double, b: Double): Double =
    math.abs(a - b) / math.max(math.max(math.abs(a), math.abs(b)), 1e-300)

  private val lonGen = Gen.chooseNum(-179.0, 179.0)
  private val latGen = Gen.chooseNum(-80.0, 80.0)
  private val sideGen = Gen.chooseNum(1e-3, 2.0)

  // a FAT isoceles triangle built from scalars (shrinking scalars
  // keeps the shape valid; elementwise list shrinking would produce
  // degenerate slivers whose relative area is ill-conditioned in ANY
  // boundary-integral formula, this one and Chamberlain-Duquette alike)
  private def fatTri(lon: Double, lat: Double, d: Double)
      : Seq[(Double, Double)] =
    Seq((lon, lat), (lon + d, lat), (lon + d / 2, lat + d), (lon, lat))

  property("area invariant under longitude shift, equator mirror, " +
      "reversal (fat triangles)") =
    forAll(lonGen, latGen, sideGen, Gen.chooseNum(-170.0, 170.0)) {
      (lon, lat, d, shift) =>
        // clamp INSIDE the property (shrinking ignores generator
        // bounds): below ~100 m the invariance is conditioning-limited
        // (sigma-endpoint rounding ~2e-16 against a sum ~1e-14), the
        // same sliver effect every boundary-integral formula has
        val tri = fatTri(lon, lat,
          math.max(1e-3, math.min(d, 80 - math.abs(lat))))
        val a = Ellipsoid.polygonAreaM2(tri).get
        val shifted = tri.map { case (lo, la) =>
          val l = lo + shift
          (if (l > 180) l - 360 else if (l < -180) l + 360 else l, la)
        }
        val mirrored = tri.map { case (lo, la) => (lo, -la) }
        rel(Ellipsoid.polygonAreaM2(shifted).get, a) < 1e-9 &&
          rel(Ellipsoid.polygonAreaM2(mirrored).get, a) < 1e-9 &&
          rel(Ellipsoid.polygonAreaM2(tri.reverse).get, a) < 1e-12
    }

  property("CONVEX quad area = sum of its geodesic-diagonal triangles " +
      "(|.|-additivity needs a simple polygon — the first property " +
      "draft generated self-intersecting slivers and failed honestly)") =
    forAll(lonGen, Gen.chooseNum(-75.0, 75.0),
        Gen.chooseNum(0.01, 2.0), Gen.chooseNum(0.01, 2.0)) {
      (lon, lat, w, h) =>
        val a = (lon, lat); val b = (lon + w, lat)
        val c = (lon + w, lat + h); val d = (lon, lat + h)
        val quad = Ellipsoid.polygonAreaM2(Seq(a, b, c, d, a)).get
        val t1 = Ellipsoid.polygonAreaM2(Seq(a, b, c, a)).get
        val t2 = Ellipsoid.polygonAreaM2(Seq(a, c, d, a)).get
        rel(quad, t1 + t2) < 1e-7
    }

  property("authalic residual obeys the measured size law: " +
      "rel < 1e-5 + tan(lat)*dLat/4 (2x the r14 edge-residual law — " +
      "the flat 1e-5 claim holds only at building scale, which this " +
      "property caught)") =
    forAll(lonGen, Gen.chooseNum(-70.0, 70.0), Gen.chooseNum(1e-3, 0.05)) {
      (lon, lat, d) =>
        val ring = Seq((lon, lat), (lon + d, lat + d / 3),
          (lon + d / 2, lat + d), (lon - d / 4, lat + d / 2), (lon, lat))
        val bound = 1e-5 +
          math.abs(math.tan(math.toRadians(lat + d / 2))) *
            math.toRadians(d) / 4
        rel(Ellipsoid.polygonAreaM2(ring).get,
          GeoFunctions.geodesicAreaSpheroidM2(ring).get) < bound
    }

  property("distance: symmetry, identity, triangle inequality") =
    forAll(lonGen, latGen, lonGen, latGen, lonGen, latGen) {
      (lo1, la1, lo2, la2, lo3, la3) =>
        val dab = Ellipsoid.geodesicDistanceM(lo1, la1, lo2, la2)
        val dba = Ellipsoid.geodesicDistanceM(lo2, la2, lo1, la1)
        val dac = Ellipsoid.geodesicDistanceM(lo1, la1, lo3, la3)
        val dcb = Ellipsoid.geodesicDistanceM(lo3, la3, lo2, la2)
        rel(dab, dba) < 1e-9 &&
          Ellipsoid.geodesicDistanceM(lo1, la1, lo1, la1) == 0.0 &&
          dab <= dac + dcb + 1e-6
    }

  property("equatorial distance: a*|dLam| inside the (1-f)pi regime, " +
      "off-equator solve beyond it — bounded by the half-meridian, " +
      "never above the equator reading, and triangle-safe through a " +
      "near-equator detour point (the r16 falsified band, now drawn " +
      "EVERY run instead of by seed luck)") =
    forAll(lonGen, Gen.chooseNum(0.1, 180.0), Gen.chooseNum(1e-6, 1e-4)) {
      (lon1, dLamDeg0, eps0) =>
        // clamp INSIDE the property: shrinking ignores generator bounds
        val dLamDeg = math.max(0.1, math.min(180.0, dLamDeg0))
        val eps = math.max(1e-6, math.min(1e-4, eps0))
        val lon2raw = lon1 + dLamDeg
        val lon2 = if (lon2raw > 180) lon2raw - 360 else lon2raw
        val d = Ellipsoid.geodesicDistanceM(lon1, 0.0, lon2, 0.0)
        val spec = Ellipsoid.WGS84
        val regime = (1 - spec.f) * 180.0
        val halfMeridian = 2 * 10001965.7293
        val inRegime = dLamDeg <= regime
        val regimeOk =
          if (inRegime)
            rel(d, spec.a * math.toRadians(dLamDeg)) < 1e-12
          else
            d <= spec.a * math.toRadians(dLamDeg) + 1e-6 &&
              d <= halfMeridian + 0.01 &&
              d >= spec.a * math.toRadians(regime) - 1e-6
        // triangle inequality through a just-off-equator point between
        // them (the exact shape of the r16 counterexample)
        val midLon = {
          val m = lon1 + dLamDeg / 2
          if (m > 180) m - 360 else m
        }
        val dac = Ellipsoid.geodesicDistanceM(lon1, 0.0, midLon, eps)
        val dcb = Ellipsoid.geodesicDistanceM(midLon, eps, lon2, 0.0)
        // 1 mm slack, not 1 µm: C sits ~2 m off the geodesic, so
        // dac+dcb ≈ d to solver precision (~1e-5 m at 15,000 km —
        // measured deficit 1.06e-5 m on the first falsified draw, a
        // tolerance artifact, not a solver defect)
        regimeOk && d <= dac + dcb + 1e-3
    }

  property("general near-antipodal pairs (lat != 0, dLam -> 180): " +
      "symmetric, bounded by the polar route, within the haversine " +
      "flattening band — the regime the r16 audit flagged for " +
      "endpoint-pinned bisection, drawn explicitly every run") =
    forAll(lonGen, Gen.chooseNum(0.5, 60.0), Gen.chooseNum(179.3, 180.0),
        Gen.chooseNum(-1e-3, 1e-3)) {
      (lon1, lat0, dLamDeg0, eps) =>
        val dLamDeg = math.max(179.3, math.min(180.0, dLamDeg0))
        val lat = math.max(0.5, math.min(60.0, lat0))
        val lon2raw = lon1 + dLamDeg
        val lon2 = if (lon2raw > 180) lon2raw - 360 else lon2raw
        // B near A's antipode: lat2 = -lat1 + eps
        val d = Ellipsoid.geodesicDistanceM(lon1, lat, lon2, -lat + eps)
        val dRev = Ellipsoid.geodesicDistanceM(lon2, -lat + eps, lon1, lat)
        // the polar detour (meridian up over the pole and down) is an
        // upper bound on the geodesic; half of it is a lower bound
        // scaled by how far the points sit from the poles
        val viaPole = Ellipsoid.geodesicDistanceM(lon1, lat, lon1, 90.0) +
          Ellipsoid.geodesicDistanceM(lon1, 90.0, lon2, -lat + eps)
        val h = {
          val dLat = math.toRadians((-lat + eps) - lat) / 2
          val dLon = math.toRadians(lon2 - lon1) / 2
          val s = math.pow(math.sin(dLat), 2) +
            math.cos(math.toRadians(lat)) *
              math.cos(math.toRadians(-lat + eps)) *
              math.pow(math.sin(dLon), 2)
          2 * 6371000.0 * math.asin(math.sqrt(s))
        }
        rel(d, dRev) < 1e-9 && d <= viaPole + 1e-3 && rel(d, h) < 0.006
    }

  property("distance within 0.6% of haversine (the flattening band)") =
    forAll(lonGen, latGen, Gen.chooseNum(-178.0, 178.0), latGen) {
      (lo1, la1, lo2, la2) =>
        val d = Ellipsoid.geodesicDistanceM(lo1, la1, lo2, la2)
        val h = {
          val dLat = math.toRadians(la2 - la1) / 2
          val dLon = math.toRadians(lo2 - lo1) / 2
          val s = math.pow(math.sin(dLat), 2) +
            math.cos(math.toRadians(la1)) * math.cos(math.toRadians(la2)) *
              math.pow(math.sin(dLon), 2)
          2 * 6371000.0 * math.asin(math.sqrt(s))
        }
        d == 0.0 && h < 1 || rel(d, h) < 0.006
    }

  property("waypoints lie on the edge: distance telescopes and the " +
      "midpoint splits the arc near-evenly") =
    forAll(lonGen, Gen.chooseNum(-70.0, 70.0), sideGen, sideGen) {
      (lon, lat, dx, dy) =>
        val (lo2, la2) = (lon + dx, math.max(-80, math.min(80, lat + dy)))
        val whole = Ellipsoid.geodesicDistanceM(lon, lat, lo2, la2)
        whole < 1.0 || {
          val wp = Ellipsoid.geodesicWaypoints(lon, lat, lo2, la2, 4)
          val parts = wp.sliding(2).map { case Seq(a, b) =>
            Ellipsoid.geodesicDistanceM(a._1, a._2, b._1, b._2) }.toSeq
          rel(parts.sum, whole) < 1e-7 &&
            // uniform-σ spacing is near-uniform in s for these spans
            parts.max / parts.min < 1.01
        }
    }
}

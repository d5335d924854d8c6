package graft.functions

/** Exact ellipsoidal (geodesic-edge) polygon area — the
  * `ST_Area(geography)` semantics of the reference's threshold site
  * (`ways_to_centroids.sql:4`, PostGIS geography), closing the one
  * residual the authalic-sphere form
  * ([[GeoFunctions.geodesicAreaSpheroidM2]]) leaves open: edges there
  * are great circles of the authalic sphere, here they are TRUE
  * ellipsoid geodesics.
  *
  * Method (Karney 2013, "Algorithms for geodesics", J. Geodesy 87 —
  * the GeographicLib algorithm — recast in quadrature form):
  *
  *   area = Ra² · | Σ_edges ( Δλ + ∫_edge sin ξ dλ ) |
  *
  * where ξ is the AUTHALIC latitude (the equal-area map ellipsoid →
  * sphere of radius Ra, Snyder eq. 3-12), so by Green's theorem the
  * boundary integral of sin ξ dλ over any closed curve is exactly the
  * enclosed ellipsoid area / Ra² (the Δλ term keeps pole-enclosing
  * rings correct, the same convention as Chamberlain–Duquette's
  * leading 2). The integral runs along the true geodesic, which the
  * auxiliary-sphere parameterization gives in closed form (Karney
  * eq. 10-11): sin β = cos α₀ sin σ, tan ω = sin α₀ tan σ, and
  *
  *   λ(σ) = ω(σ) − f sin α₀ · I₃(σ),
  *   I₃(σ) = ∫₀^σ (2−f) / (1 + (1−f)√(1 + k² sin²σ′)) dσ′,
  *   k² = e′² cos²α₀.
  *
  * Where GeographicLib expands I₃ and the area integral in truncated
  * series (C₃/C₄ coefficients), this implementation evaluates both by
  * ADAPTIVE Gauss–Legendre quadrature of the exact integrands — no
  * series truncation error, at per-edge costs of a few microseconds
  * (building-scale edges converge in one 8-point panel). The inverse
  * problem (find the geodesic joining two points) is solved by
  * bisection on α₁: in Karney's canonical arrangement (β₁ ≤ 0,
  * |β₂| ≤ −β₁, λ₁₂ ∈ [0, π]) λ₁₂(α₁) is strictly monotone (§4 of the
  * paper proves root uniqueness), so 60 bisections pin α₁ to ~1e-17 —
  * slower than Newton but free of the antipodal starting-point
  * machinery, and deterministic.
  *
  * Numerical hygiene: the integrand is evaluated as
  * (sin ξ − sin ξ₀)·λ′(σ) with ξ₀ the ring's first vertex (the exact
  * compensation Σ Δλ·(1 + sin ξ₀) restores), so a building-sized ring
  * doesn't lose its area to O(1)-term cancellation; the adaptive
  * refinement automatically resolves the λ′ spike a near-meridional
  * geodesic has at its pole pass.
  *
  * Limits of scope (documented, not silent): an AREA edge whose
  * endpoints are antipodal (or equatorial with |Δλ| > (1−f)π) has an
  * ambiguous shortest geodesic (two congruent hemispheric arcs) —
  * such an edge takes the equator/meridian reading in the area path.
  * No real polygon ring carries half-world edges. The DISTANCE and
  * WAYPOINT scalars do NOT share this scope cut: their length is the
  * same for either arc, so [[geodesicDistanceM]] solves the
  * out-of-regime equatorial case exactly (and [[geodesicWaypoints]]
  * picks the northern arc by convention).
  */
object Ellipsoid {

  /** An ellipsoid of revolution: equatorial radius `a` (m), flattening
    * `f`. `f = 0` is the exact sphere (all formulas degrade
    * gracefully — the spec uses it to pin the solver against closed
    * -form spherical excess).
    */
  final case class Spec(a: Double, f: Double) {
    val b: Double = a * (1 - f)
    val e2: Double = f * (2 - f)
    val ep2: Double = e2 / (1 - e2)
    val e: Double = math.sqrt(math.max(0, e2))

    /** Snyder's authalic q(φ) as a function of sin φ. */
    def q(sinPhi: Double): Double =
      if (e2 == 0) 2 * sinPhi
      else (1 - e2) * (sinPhi / (1 - e2 * sinPhi * sinPhi) +
        atanh(e * sinPhi) / e)

    val qp: Double = q(1.0)

    /** Authalic radius squared: the sphere with the ellipsoid's area
      * (4π·ra2 = ellipsoid surface area).
      */
    val ra2: Double = a * a * qp / 2

    /** sin of the authalic latitude from sin of the geographic one. */
    def sinXi(sinPhi: Double): Double =
      math.max(-1.0, math.min(1.0, q(sinPhi) / qp))
  }

  val WGS84: Spec = Spec(6378137.0, 1.0 / 298.257223563)

  private def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))

  // 8-point Gauss–Legendre nodes/weights on [-1, 1]
  private val GlX = Array(
    -0.9602898564975363, -0.7966664774136267,
    -0.5255324099163290, -0.1834346424956498,
    0.1834346424956498, 0.5255324099163290,
    0.7966664774136267, 0.9602898564975363)
  private val GlW = Array(
    0.1012285362903763, 0.2223810344533745,
    0.3137066458778873, 0.3626837833783620,
    0.3626837833783620, 0.3137066458778873,
    0.2223810344533745, 0.1012285362903763)

  private def gl8(g: Double => Double, x1: Double, x2: Double): Double = {
    val h = (x2 - x1) / 2; val m = (x1 + x2) / 2
    var s = 0.0; var i = 0
    while (i < 8) { s += GlW(i) * g(m + h * GlX(i)); i += 1 }
    s * h
  }

  /** Adaptive composite GL8: split until whole ≈ left + right. The
    * recursion depth bound (40) caps pathological inputs; the area
    * integrand's worst feature (the λ′ pole-pass spike of width
    * ~sin α₀) resolves in ~log₂(1/sin α₀) levels.
    *
    * Acceptance is absTol OR 1e-13 RELATIVE — a purely absolute
    * tolerance below the double-rounding noise of an O(1)-magnitude
    * panel (|l+r−whole| floors at ~1e-16·|whole| and shrinks only in
    * lockstep with the tolerance as panels halve) sends the recursion
    * toward the depth cap on every evaluation: measured as
    * way_area_ellipsoid_exact at 361 s for 20k ways before the
    * relative term, 4 s after, same results to 1e-13.
    */
  private def integrate(g: Double => Double, x1: Double, x2: Double,
      absTol: Double): Double = {
    def go(a: Double, b: Double, whole: Double, tol: Double,
        depth: Int): Double = {
      val m = (a + b) / 2
      val l = gl8(g, a, m); val r = gl8(g, m, b)
      val err = math.abs(l + r - whole)
      if (depth >= 40 || err <= tol || err <= 1e-13 * math.abs(l + r))
        l + r
      else go(a, m, l, tol / 2, depth + 1) + go(m, b, r, tol / 2, depth + 1)
    }
    if (x1 == x2) 0.0
    else {
      // top-level panels of <= 0.5 rad keep the first estimate honest
      val n = math.max(1, math.ceil(math.abs(x2 - x1) / 0.5).toInt)
      val w = (x2 - x1) / n
      (0 until n).map { i =>
        val a = x1 + i * w; val b = a + w
        go(a, b, gl8(g, a, b), absTol / n, 0)
      }.sum
    }
  }

  /** I₃(σ₁→σ₂) for the exact longitude equation (integrand from Karney
    * eq. 8; smooth, amplitude variation ~e′²/4, converges in the first
    * panel for any real edge).
    */
  private def i3(spec: Spec, k2: Double, s1: Double, s2: Double): Double = {
    val f = spec.f
    integrate(s => {
      val ss = math.sin(s)
      (2 - f) / (1 + (1 - f) * math.sqrt(1 + k2 * ss * ss))
    }, s1, s2, 1e-16)
  }

  /** One evaluation of the canonical-frame geometry for a trial
    * cos α₁: returns (λ₁₂ estimate, sin α₀, cos α₀, σ₁, σ₂).
    * Inputs are sin/cos of the REDUCED latitudes, canonical
    * (sb1 ≤ 0, |sb2| ≤ −sb1 up to roundoff).
    *
    * The trial variable is cos α₁, NOT α₁: a near-grazing edge (a
    * short E–W edge sitting at its own geodesic vertex — every small
    * lat/lon-aligned polygon has two) solves at α₁ ≈ π/2, where
    * sin α₁ is flat at double precision, so 1 − sin α₁ (which drives
    * the tiny cos σ₂) quantizes in ~7e-10-wide plateaus and a root
    * find on α₁ converges onto a staircase ~1e-9 off in λ — a 4e-4
    * relative area error on 100 m squares, measured. In cos α₁ the
    * sensitive combination cos²σ₂ = cos²β₂ − sin²α₀ re-associates to
    * the exact nonnegative sum (sβ₁−sβ₂)(sβ₁+sβ₂) + (cβ₁ cos α₁)²,
    * and nothing passes through the flat top of sine.
    */
  private def lamEst(spec: Spec, sb1: Double, cb1: Double,
      sb2: Double, cb2: Double, calp1: Double)
      : (Double, Double, Double, Double, Double) = {
    val salp1 = math.sqrt(math.max(0, (1 - calp1) * (1 + calp1)))
    val salp0 = salp1 * cb1
    // cos²α₀ = cos²α₁ + sin²α₁ sin²β₁ (stable near α₁ = π/2)
    val calp0 = math.hypot(calp1, salp1 * sb1)
    val sig1 = math.atan2(sb1, cb1 * calp1)
    val om1 = math.atan2(salp0 * sb1, cb1 * calp1)
    // point 2 on the ascending branch (canonical: α₂ ∈ [0, π/2]);
    // cos²β₂ − sin²α₀ as a sum of nonnegative exact products — the
    // naive difference of two ~1 doubles loses the grazing geometry
    val csig2u = math.sqrt(math.max(0,
      (sb1 - sb2) * (sb1 + sb2) + (cb1 * calp1) * (cb1 * calp1)))
    val sig2 = math.atan2(sb2, csig2u)
    val om2 = math.atan2(salp0 * sb2, csig2u)
    val k2 = spec.ep2 * calp0 * calp0
    val lam = (om2 - om1) -
      spec.f * salp0 * i3(spec, k2, sig1, sig2)
    (lam, salp0, calp0, sig1, sig2)
  }

  /** Solve the canonical inverse problem by bisection on cos α₁ —
    * λ₁₂ is monotone DECREASING in cos α₁ (increasing in α₁, Karney
    * §4 root uniqueness), λ₁₂ target ∈ (0, π). Returns
    * (α₁, sin α₀, cos α₀, σ₁, σ₂).
    */
  private[functions] def solveCanonical(spec: Spec, sb1: Double,
      cb1: Double, sb2: Double, cb2: Double, lam12: Double)
      : (Double, Double, Double, Double, Double) = {
    var xLo = -1.0 + 1e-16 // λ₁₂ large end
    var xHi = 1.0 - 1e-16 // λ₁₂ ≈ 0 end
    var i = 0
    while (i < 60) {
      val mid = (xLo + xHi) / 2
      val est = lamEst(spec, sb1, cb1, sb2, cb2, mid)._1
      if (est < lam12) xHi = mid else xLo = mid
      i += 1
    }
    val calp1 = (xLo + xHi) / 2
    val (_, salp0, calp0, sig1, sig2) =
      lamEst(spec, sb1, cb1, sb2, cb2, calp1)
    val salp1 = math.sqrt(math.max(0, (1 - calp1) * (1 + calp1)))
    (math.atan2(salp1, calp1), salp0, calp0, sig1, sig2)
  }

  /** sin ξ at parameter σ of a geodesic with cos α₀ = calp0. */
  private def sinXiAt(spec: Spec, calp0: Double, sig: Double): Double = {
    val sb = calp0 * math.sin(sig) // sin of reduced latitude
    val omf = 1 - spec.f
    val sphi = sb / math.sqrt(sb * sb + omf * omf * (1 - sb * sb))
    spec.sinXi(sphi)
  }

  /** ∫ (sin ξ − c) dλ along the canonical-frame geodesic from σ₁ to
    * σ₂. λ′(σ) = sin α₀·[1/(cos²σ + sin²α₀ sin²σ)
    *             − f(2−f)/(1+(1−f)√(1+k² sin²σ))] ≥ 0.
    */
  private def areaIntegral(spec: Spec, salp0: Double, calp0: Double,
      sig1: Double, sig2: Double, c: Double): Double = {
    if (salp0 == 0) return 0.0 // meridional: dλ = 0
    val f = spec.f
    val k2 = spec.ep2 * calp0 * calp0
    integrate(s => {
      val ss = math.sin(s); val cs = math.cos(s)
      val dOm = 1.0 / (cs * cs + salp0 * salp0 * ss * ss)
      val dI3 = (2 - f) / (1 + (1 - f) * math.sqrt(1 + k2 * ss * ss))
      (sinXiAt(spec, calp0, s) - c) * salp0 * (dOm - f * dI3)
    }, sig1, sig2, 1e-14)
  }

  private def wrapPi(x: Double): Double = {
    val r = math.IEEEremainder(x, 2 * math.Pi)
    if (r <= -math.Pi) r + 2 * math.Pi else r
  }

  /** The per-edge COMPENSATED integral ∫(sin ξ − s0) dλ, all angles
    * in RADIANS, s0 = sin ξ of the ring's first vertex. The
    * uncompensated Δλ·(1 + s0) part is NOT accumulated here:
    * [[polygonAreaM2]] sums the winding Σ Δλ separately and snaps it
    * to its exact topological value (0 or ±2πk) — per-edge wrap
    * rounding otherwise leaves Σ Δλ ≈ ±4e-16 of noise that the
    * (1 + s0) factor injects as area (measured 3e-6 relative on an
    * antimeridian-straddling 100 m triangle).
    */
  private def edgeTerm(spec: Spec, phi1: Double, lam1: Double,
      phi2: Double, lam2: Double, s0: Double): Double = {
    val dLam = wrapPi(lam2 - lam1)
    if (dLam == 0.0 && phi1 == phi2) return 0.0
    val omf = 1 - spec.f
    // pole endpoints: the edge is a meridian pair through the pole;
    // all of Δλ happens where sin ξ = ±1
    val poleEps = 1e-12
    if (math.Pi / 2 - math.abs(phi1) < poleEps)
      return dLam * ((if (phi1 > 0) 1.0 else -1.0) - s0)
    if (math.Pi / 2 - math.abs(phi2) < poleEps)
      return dLam * ((if (phi2 > 0) 1.0 else -1.0) - s0)
    if (dLam == 0.0) return 0.0 // meridional edge, no pole between
    if (phi1 == 0.0 && phi2 == 0.0)
      return -s0 * dLam // equatorial edge: sin ξ = 0 on path
    // reduced latitudes
    val b1 = math.atan(omf * math.tan(phi1))
    val b2 = math.atan(omf * math.tan(phi2))
    // canonical arrangement (Karney §4) — order matters: a swap
    // REVERSES the edge, so the longitude mirror must be decided on
    // the post-swap Δλ (each transform contributes one sign flip to
    // the path integral: reversal, λ-mirror, equator-mirror)
    var (bb1, bb2) = (b1, b2); var lam12 = dLam
    var swapsign = 1.0
    if (math.abs(bb1) < math.abs(bb2)) {
      val t = bb1; bb1 = bb2; bb2 = t; lam12 = -lam12; swapsign = -1.0
    }
    var lonsign = 1.0
    if (lam12 < 0) { lonsign = -1.0; lam12 = -lam12 }
    var latsign = 1.0
    if (bb1 > 0) { latsign = -1.0; bb1 = -bb1; bb2 = -bb2 }
    val (sb1, cb1) = (math.sin(bb1), math.cos(bb1))
    val (sb2, cb2) = (math.sin(bb2), math.cos(bb2))
    val (_, salp0, calp0, sig1, sig2) =
      solveCanonical(spec, sb1, cb1, sb2, cb2, lam12)
    val fCanon =
      areaIntegral(spec, salp0, calp0, sig1, sig2, latsign * s0)
    lonsign * swapsign * latsign * fCanon
  }

  /** Exact ellipsoidal area in m² of a closed lon/lat ring (degrees,
    * first point == last). Null-contract matches
    * [[GeoFunctions.geodesicAreaM2]]: None for invalid rings.
    */
  def polygonAreaM2(ring: Seq[(Double, Double)],
      spec: Spec = WGS84): Option[Double] = {
    if (!GeoFunctions.ringValid(ring)) return None
    val rad = ring.map { case (lon, lat) =>
      (math.toRadians(lon), math.toRadians(lat)) }
    val s0 = {
      val sphi = math.sin(rad.head._2)
      spec.sinXi(sphi)
    }
    var sum = 0.0
    var winding = 0.0
    var i = 0
    while (i < rad.size - 1) {
      val (l1, p1) = rad(i); val (l2, p2) = rad(i + 1)
      sum += edgeTerm(spec, p1, l1, p2, l2, s0)
      winding += wrapPi(rad(i + 1)._1 - rad(i)._1)
      i += 1
    }
    // the winding is exactly 0 (ordinary ring) or ±2πk (pole-enclosing)
    // by topology — snap away the per-edge wrap rounding before the
    // (1 + s0) factor can turn it into area
    val w = 2 * math.Pi * math.round(winding / (2 * math.Pi))
    Some(math.abs(w * (1 + s0) + sum) * spec.ra2)
  }

  /** A point at parameter σ of the canonical-frame geodesic:
    * (φ, λ−λ(σ₁)) in radians.
    */
  private def waypoint(spec: Spec, salp0: Double,
      calp0: Double, sig1: Double, sig: Double): (Double, Double) = {
    val sb = calp0 * math.sin(sig)
    val phi = math.atan2(sb, (1 - spec.f) * math.sqrt(math.max(0, 1 - sb * sb)))
    val om = math.atan2(salp0 * math.sin(sig), math.cos(sig))
    val om1 = math.atan2(salp0 * math.sin(sig1), math.cos(sig1))
    val k2 = spec.ep2 * calp0 * calp0
    val lam = (om - om1) - spec.f * salp0 * i3(spec, k2, sig1, sig)
    (phi, lam)
  }

  /** For two EQUATORIAL points with |Δλ| ∈ ((1−f)π, π], the equator is
    * NOT the shortest path on an oblate ellipsoid (Karney 2013 §5): the
    * geodesic leaves the equator, crossing it at an oblique azimuth α₀
    * and re-meeting it half an auxiliary-sphere revolution later
    * (σ: 0 → π, so ω₂ − ω₁ = π exactly). Its longitude equation,
    *
    *   λ₁₂(α₀) = π − f·sin α₀·I₃(0, π; k² = e′²cos²α₀),
    *
    * is strictly decreasing in sin α₀ from λ₁₂(0) = π (the meridian
    * over the pole — the Δλ = π antipodal case) down to
    * λ₁₂(1) = (1−f)π (the equator itself — the regime boundary, where
    * the arc length b·π equals the equatorial reading a(1−f)π EXACTLY,
    * so the two branches are continuous by construction). 60
    * bisections on sin α₀ pin the root; returns (sin α₀, cos α₀).
    */
  private def solveEquatorialOblique(spec: Spec, absDLam: Double)
      : (Double, Double) = {
    var lo = 0.0 // λ₁₂ = π end
    var hi = 1.0 // λ₁₂ = (1−f)π end
    var i = 0
    while (i < 60) {
      val mid = (lo + hi) / 2
      val c2 = (1 - mid) * (1 + mid)
      val lam = math.Pi - spec.f * mid * i3(spec, spec.ep2 * c2, 0, math.Pi)
      if (lam > absDLam) lo = mid else hi = mid
      i += 1
    }
    val salp0 = (lo + hi) / 2
    (salp0, math.sqrt(math.max(0, (1 - salp0) * (1 + salp0))))
  }

  /** The regime boundary for the equatorial fast path: the equator is
    * the shortest geodesic between two equatorial points iff
    * |Δλ| ≤ (1−f)π (Karney 2013 §5).
    */
  private def equatorialRegime(spec: Spec): Double = (1 - spec.f) * math.Pi

  /** Exact geodesic DISTANCE in meters between two lon/lat-degree
    * points — the same inverse solve as the area path, then
    * s = b·∫√(1 + k² sin²σ) dσ (Karney eq. 7's I₁, evaluated by the
    * same adaptive quadrature instead of the C₁ series). Meridional
    * edges take their closed integrals; equatorial pairs take a·|Δλ|
    * only inside the |Δλ| ≤ (1−f)π regime where the equator IS the
    * geodesic — beyond it [[solveEquatorialOblique]] finds the
    * off-equator path (at Δλ = π exactly: the half-meridian over the
    * pole, ≈ 20,003,931.46 m on WGS84, NOT a·π ≈ 20,037,508 m — the
    * 33.6 km overstatement the unguarded fast path used to make, which
    * deterministically violated the triangle inequality).
    */
  def geodesicDistanceM(lon1: Double, lat1: Double, lon2: Double,
      lat2: Double, spec: Spec = WGS84): Double = {
    val p1 = (math.toRadians(lon1), math.toRadians(lat1))
    val p2 = (math.toRadians(lon2), math.toRadians(lat2))
    val dLam = wrapPi(p2._1 - p1._1)
    val omf = 1 - spec.f
    val b1 = math.atan(omf * math.tan(p1._2))
    val b2 = math.atan(omf * math.tan(p2._2))
    def arc(k2: Double, s1: Double, s2: Double): Double =
      spec.b * integrate(s => {
        val ss = math.sin(s); math.sqrt(1 + k2 * ss * ss)
      }, s1, s2, 1e-16)
    if (dLam == 0.0 || 90 - math.abs(lat1) < 1e-9 ||
        90 - math.abs(lat2) < 1e-9) {
      // meridian: α₀ = 0, k² = e′², σ = β (pole endpoints included —
      // β(±90°) = ±π/2 exactly)
      return arc(spec.ep2, math.min(b1, b2), math.max(b1, b2))
    }
    if (lat1 == 0.0 && lat2 == 0.0) {
      val adl = math.abs(dLam)
      if (adl <= equatorialRegime(spec)) return spec.a * adl // equator
      // beyond the regime the geodesic leaves the equator: solve α₀,
      // then the length is the half-revolution arc σ ∈ [0, π]
      val (_, calp0) = solveEquatorialOblique(spec, adl)
      return arc(spec.ep2 * calp0 * calp0, 0, math.Pi)
    }
    var (bb1, bb2) = (b1, b2); var lam12 = dLam
    if (math.abs(bb1) < math.abs(bb2)) {
      val t = bb1; bb1 = bb2; bb2 = t; lam12 = -lam12
    }
    if (lam12 < 0) lam12 = -lam12
    if (bb1 > 0) { bb1 = -bb1; bb2 = -bb2 }
    val (_, _, calp0, sig1, sig2) = solveCanonical(spec,
      math.sin(bb1), math.cos(bb1), math.sin(bb2), math.cos(bb2), lam12)
    arc(spec.ep2 * calp0 * calp0, sig1, sig2)
  }

  /** `n+1` points (P1 … P2 inclusive, lon/lat DEGREES) uniformly
    * spaced in the arc parameter along the geodesic joining P1 and P2
    * — edge densification (the consistency seam the area spec leans
    * on: a polygon and its geodesic-densified form must have the SAME
    * area, since the inserted vertices lie ON the original edges).
    * Meridional and equatorial edges interpolate linearly in the
    * obvious coordinate. INTERIOR waypoint longitudes are wrapped
    * into [−180, 180) (r17 ADVICE: the out-of-regime equatorial arcs
    * always span ~180° and emitted lons up to ~280 unwrapped, which
    * grid joins and GeoJSON consumers would misplace); endpoints are
    * returned exactly as the caller passed them.
    */
  def geodesicWaypoints(lon1: Double, lat1: Double, lon2: Double,
      lat2: Double, n: Int, spec: Spec = WGS84): Seq[(Double, Double)] = {
    require(n >= 1, "n >= 1")
    val p1 = (math.toRadians(lon1), math.toRadians(lat1))
    val p2 = (math.toRadians(lon2), math.toRadians(lat2))
    val dLam = wrapPi(p2._1 - p1._1)
    def lerp: Seq[(Double, Double)] = (0 to n).map { i =>
      val t = i.toDouble / n
      (lon1 + t * math.toDegrees(dLam), lat1 + t * (lat2 - lat1))
    }
    if (dLam == 0.0 ||
        (lat1 == 0.0 && lat2 == 0.0 &&
          math.abs(dLam) <= equatorialRegime(spec)) ||
        90 - math.abs(lat1) < 1e-9 || 90 - math.abs(lat2) < 1e-9)
      return lerp
    if (lat1 == 0.0 && lat2 == 0.0) {
      // equatorial beyond the (1−f)π regime: the geodesic arcs off the
      // equator (σ: 0 → π). The two hemispheric arcs are congruent
      // shortest paths — take the northern one, heading sign(Δλ).
      val (salp0, calp0) = solveEquatorialOblique(spec, math.abs(dLam))
      val sgn = if (dLam >= 0) 1.0 else -1.0
      val pts = (0 to n).map { i =>
        val sig = math.Pi * i / n
        val (phiC, dlamC) = waypoint(spec, salp0, calp0, 0.0, sig)
        (wrapLonDeg(math.toDegrees(p1._1 + sgn * dlamC)),
          math.toDegrees(phiC))
      }
      return (lon1, lat1) +: pts.slice(1, n) :+ ((lon2, lat2))
    }
    val omf = 1 - spec.f
    val b1 = math.atan(omf * math.tan(p1._2))
    val b2 = math.atan(omf * math.tan(p2._2))
    var (bb1, bb2) = (b1, b2); var lam12 = dLam
    var swapped = false
    if (math.abs(bb1) < math.abs(bb2)) {
      val t = bb1; bb1 = bb2; bb2 = t; lam12 = -lam12; swapped = true
    }
    var lonsign = 1.0
    if (lam12 < 0) { lonsign = -1.0; lam12 = -lam12 }
    var latsign = 1.0
    if (bb1 > 0) { latsign = -1.0; bb1 = -bb1; bb2 = -bb2 }
    val (_, salp0, calp0, sig1, sig2) = solveCanonical(spec,
      math.sin(bb1), math.cos(bb1), math.sin(bb2), math.cos(bb2), lam12)
    // canonical start is P2 when swapped; its absolute longitude
    val lamStart = if (swapped) p2._1 else p1._1
    val pts = (0 to n).map { i =>
      val sig = sig1 + (sig2 - sig1) * i / n
      val (phiC, dlamC) = waypoint(spec, salp0, calp0, sig1, sig)
      (wrapLonDeg(math.toDegrees(lamStart + lonsign * dlamC)),
        math.toDegrees(latsign * phiC))
    }
    val out = if (swapped) pts.reverse else pts
    // pin the endpoints exactly (solver residual ~1e-15 rad otherwise)
    (lon1, lat1) +: out.slice(1, n) :+ ((lon2, lat2))
  }

  /** Wrap a longitude in degrees into [−180, 180). */
  private def wrapLonDeg(l: Double): Double = {
    val w = ((l + 180.0) % 360.0 + 360.0) % 360.0 - 180.0
    w
  }
}

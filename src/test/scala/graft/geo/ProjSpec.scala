package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class ProjSpec extends AnyFunSuite {
  private val cases: Seq[(String, Seq[(Double, Double)])] = Seq(
    "EPSG:32610" -> Seq((-123.0, 47.8), (-124.5, 40.0), (-121.2, 55.0)),
    "EPSG:32633" -> Seq((15.0, 0.01), (12.5, 45.0), (17.9, 70.0)),
    "EPSG:32760" -> Seq((177.0, -45.0), (174.1, -10.0), (179.9, -75.0)),
    "EPSG:3413"  -> Seq((-45.0, 70.0), (10.0, 85.0), (-120.0, 60.0)),
    "EPSG:3031"  -> Seq((0.0, -71.0), (90.0, -85.0), (-170.0, -60.0)))

  test("inverse ∘ forward is identity (≤1e-9°) across the registered family") {
    for (datum <- Seq(Proj.Wgs84, Proj.Sphere);
         (crs, pts) <- cases; (lon, lat) <- pts) {
      val p = Proj.of(crs, datum)
      val (x, y) = p.forward(lon, lat)
      val (lo, la) = p.inverse(x, y)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9,
        s"$crs ($lon, $lat) → ($x, $y) → ($lo, $la)")
    }
  }

  test("UTM forward IS localtmerc scaled by k0 with false offsets (geolib.py:122-127)") {
    // cross-check against the independently-tested Srs scalar
    for ((lon, lat) <- Seq((-123.0, 47.8), (-124.7, 52.3), (-121.0, 40.1))) {
      val (xl, yl) = Srs.localTmerc(-123.0, 0.0)(lon, lat)
      val (x, y) = Proj.of("EPSG:32610", Proj.Sphere).forward(lon, lat)
      assert(math.abs(x - (500000.0 + 0.9996 * xl)) < 1e-6, s"x at ($lon,$lat)")
      assert(math.abs(y - 0.9996 * yl) < 1e-6, s"y at ($lon,$lat)")
    }
  }

  test("UTM zone parameters and known anchor points") {
    // central meridian maps to the false easting; equator to FN
    val (x0, y0) = Proj.of("EPSG:32633").forward(15.0, 0.0)
    assert(math.abs(x0 - 500000.0) < 1e-9 && math.abs(y0) < 1e-9)
    val (xs, ys) = Proj.of("EPSG:32760").forward(177.0, 0.0)
    assert(math.abs(xs - 500000.0) < 1e-9 && math.abs(ys - 1e7) < 1e-9)
    // zone number → lon0 (10 → −123, 33 → 15, 60 → 177): southern point west
    // of lon0 lands west of FE
    val (xw, _) = Proj.of("EPSG:32610").forward(-124.0, 47.0)
    assert(xw < 500000.0)
    intercept[IllegalArgumentException] { Proj.of("EPSG:9999") }
  }

  test("polar stereo: pole at origin, true scale at lat_ts, hemisphere mirror") {
    // parallel radius at φ: R·cosφ on the sphere, ν·cosφ on the ellipsoid
    def parRad(datum: String, latDeg: Double): Double = {
      val phi = math.toRadians(math.abs(latDeg))
      if (datum == Proj.Sphere) Proj.R * math.cos(phi)
      else Ellipsoid.a / math.sqrt(1 - Ellipsoid.e2 * math.sin(phi) * math.sin(phi)) *
        math.cos(phi)
    }
    val dl = 0.01
    for (datum <- Seq(Proj.Wgs84, Proj.Sphere)) {
      val n = Proj.of("EPSG:3413", datum)
      val (px, py) = n.forward(-45.0, 90.0)
      assert(math.hypot(px, py) < 1e-6)
      // scale at the standard parallel: projected arc ≈ true arc (0.01%)
      val (x1, y1) = n.forward(30.0, 70.0); val (x2, y2) = n.forward(30.0 + dl, 70.0)
      val trueArc = parRad(datum, 70.0) * math.toRadians(dl)
      assert(math.abs(math.hypot(x2 - x1, y2 - y1) / trueArc - 1.0) < 1e-4, datum)
      val s = Proj.of("EPSG:3031", datum)
      val (sx, sy) = s.forward(0.0, -90.0)
      assert(math.hypot(sx, sy) < 1e-6)
      val (a1, b1) = s.forward(45.0, -71.0); val (a2, b2) = s.forward(45.0 + dl, -71.0)
      val trueArcS = parRad(datum, -71.0) * math.toRadians(dl)
      assert(math.abs(math.hypot(a2 - a1, b2 - b1) / trueArcS - 1.0) < 1e-4, datum)
    }
  }

  test("projectExtent covers every interior point (densified boundary bbox)") {
    val e = Extent(500000.0, 5290000.0, 520000.0, 5310000.0) // 20 km UTM box
    for (dst <- Seq("EPSG:4326", "EPSG:3413")) {
      val pe = Proj.projectExtent(e, "EPSG:32610", dst)
      val t = Proj.transform("EPSG:32610", dst)
      for (i <- 0 to 10; j <- 0 to 10) {
        val (x, y) = t(e.xmin + i * (e.xmax - e.xmin) / 10,
                       e.ymin + j * (e.ymax - e.ymin) / 10)
        assert(x >= pe.xmin - 1e-9 && x <= pe.xmax + 1e-9 &&
               y >= pe.ymin - 1e-9 && y <= pe.ymax + 1e-9,
          s"$dst interior point ($x, $y) escapes $pe")
      }
    }
  }

  test("web-Mercator and proj4-string resolution mirror the EPSG family") {
    val m = Proj.of("EPSG:3857")
    val (x, y) = m.forward(10.0, 45.0)
    val (lo, la) = m.inverse(x, y)
    assert(math.abs(lo - 10.0) < 1e-9 && math.abs(la - 45.0) < 1e-9)
    assert(math.abs(m.forward(0, 0)._1) < 1e-9 && math.abs(m.forward(0, 0)._2) < 1e-9)
    // proj4 strings resolve to the same projections as their EPSG twins
    for ((p4, epsg, pt) <- Seq(
        ("+proj=utm +zone=10 +datum=WGS84", "EPSG:32610", (-123.4, 47.1)),
        ("+proj=utm +zone=60 +south", "EPSG:32760", (176.2, -41.0)),
        ("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45", "EPSG:3413", (-40.0, 75.0)),
        ("+proj=stere +lat_0=-90 +lat_ts=-71", "EPSG:3031", (10.0, -80.0)),
        ("+proj=longlat", "EPSG:4326", (5.0, 5.0)),
        ("+proj=merc +lon_0=0", "EPSG:3857", (10.0, 45.0)))) {
      assert(Proj.of(p4).forward(pt._1, pt._2) == Proj.of(epsg).forward(pt._1, pt._2),
        s"$p4 vs $epsg")
    }
    intercept[IllegalArgumentException] { Proj.of("+proj=aea +lat_1=29.5") }
  }

  test("resIn: projected pixel step matches the local degree/meter scale") {
    val g = GridSpec(500000.0, 5300000.0, 100.0, "EPSG:32610", 50, 50)
    val r4326 = Proj.resIn(g, "EPSG:4326", Proj.Sphere)
    // at the central meridian a 100 m east-step is ~100/(R·cosφ) degrees
    val (_, latC) = Proj.of("EPSG:32610", Proj.Sphere)
      .inverse(g.pixelToMap(25, 25)._1, g.pixelToMap(25, 25)._2)
    val want = 100.0 / (Proj.R * math.cos(math.toRadians(latC))) * 180.0 / math.Pi
    assert(math.abs(r4326 / want - 1.0) < 1e-3, s"$r4326 vs $want")
    assert(Proj.resIn(g, "EPSG:32610") == 100.0) // identity short-circuit
  }

  // ------------------------------------------------------------------
  // WGS84 ellipsoidal anchors — every check is INDEPENDENT of the Krüger
  // series under test: published geodetic constants, direct numerical
  // quadrature, and the exact atanh-form conformal latitude.
  // ------------------------------------------------------------------

  test("ellipsoid: rectifying radius reproduces the published WGS84 quarter meridian") {
    // meridian quadrant = A·π/2; the published WGS84 value is
    // 10 001 965.7293 m (e.g. Snyder PP 1395 table 5 lineage)
    assert(math.abs(Ellipsoid.A * math.Pi / 2 - 10001965.7293) < 1e-3)
  }

  test("ellipsoid: central-meridian northing equals the quadrature meridian arc") {
    // N(φ) on the central meridian must be k0·M(φ) with
    // M(φ) = ∫ a(1−e²)/(1−e²sin²t)^{3/2} dt — computed here by composite
    // Simpson, a derivation the Krüger α series never touches. At η = 0 the
    // series is ξ = ξ' + Σ αⱼ sin 2jξ', so this validates every αⱼ.
    val p = TmercKruger(-123.0, 0.9996, 500000.0, 0.0)
    val e2 = Ellipsoid.e2
    def integrand(t: Double) =
      Ellipsoid.a * (1 - e2) / math.pow(1 - e2 * math.sin(t) * math.sin(t), 1.5)
    for (latDeg <- Seq(5.0, 31.0, 47.6, 64.2, 83.0)) {
      val n = 20000; val h = math.toRadians(latDeg) / n
      var m = 0.0; var i = 0
      while (i < n) {
        val a0 = i * h
        m += h / 6 * (integrand(a0) + 4 * integrand(a0 + h / 2) + integrand(a0 + h))
        i += 1
      }
      val (x, y) = p.forward(-123.0, latDeg)
      assert(math.abs(x - 500000.0) < 1e-9, s"CM easting at $latDeg")
      assert(math.abs(y - 0.9996 * m) < 1e-6, s"northing vs quadrature at $latDeg: $y vs ${0.9996 * m}")
    }
  }

  test("ellipsoid: δ series inverts the exact conformal latitude to <1e-12 rad") {
    for (k <- 0 to 48) {
      val phi = math.toRadians(-89.0 + k * 3.7)
      val chi = math.atan(Ellipsoid.conformalTan(phi))
      assert(math.abs(Ellipsoid.geodeticLat(chi) - phi) < 1e-12, s"phi $phi")
    }
  }

  test("ellipsoid vs sphere placements differ by the documented <0.6 % bound") {
    // the mean-sphere radius sits between the WGS84 meridian radii
    // (6 335 439 m at the equator, 6 399 594 m at the poles), so spherical
    // placements drift from ellipsoidal ones by at most ~0.56 % of the
    // distance from the projection origin
    for ((crs, pts) <- cases; (lon, lat) <- pts) {
      val pe = Proj.of(crs, Proj.Wgs84); val ps = Proj.of(crs, Proj.Sphere)
      val (xe, ye) = pe.forward(lon, lat); val (xs, ys) = ps.forward(lon, lat)
      val d = math.hypot(xe - xs, ye - ys)
      val rho = math.hypot(xe - (if (crs.startsWith("EPSG:326") || crs.startsWith("EPSG:327")) 500000.0 else 0.0),
                           ye - (if (crs == "EPSG:32760") 1e7 else 0.0))
      assert(d <= 0.006 * math.max(rho, 1e5),
        s"$crs ($lon,$lat): ell-sphere gap $d vs origin distance $rho")
    }
  }

  test("ellipsoid: published EPSG worked examples reproduce to the printed precision") {
    // Three PUBLIC test vectors, independent of everything this suite
    // derives (the documents print E/N to 0.01 m / 1 mm):
    // 1. EPSG Guidance Note 7-2, Polar Stereographic Variant A example
    //    (WGS 84 / UPS North): lat0=90, k0=0.994, FE=FN=2 000 000;
    //    φ=73°N λ=44°E → E=3 320 416.75, N=632 668.43. Variant A scales
    //    the pole-true ρ by k0, so the engine's lat_ts=90 form × 0.994.
    val ups = PolarStereoEll(north = true, 90.0, 0.0)
    val (ux, uy) = ups.forward(44.0, 73.0)
    assert(math.abs(2e6 + 0.994 * ux - 3320416.75) < 0.02, s"UPS E ${2e6 + 0.994 * ux}")
    assert(math.abs(2e6 + 0.994 * uy - 632668.43) < 0.02, s"UPS N ${2e6 + 0.994 * uy}")
    // 2. EPSG Guidance Note 7-2, Polar Stereographic Variant B example
    //    (WGS 84 / Australian Antarctic, EPSG:3032): lat_ts=−71 lon0=70°E,
    //    FE=FN=6 000 000; φ=75°S λ=120°E → E=7 255 380.79, N=7 053 389.56.
    val aaps = PolarStereoEll(north = false, -71.0, 70.0)
    val (bx, by) = aaps.forward(120.0, -75.0)
    assert(math.abs(6e6 + bx - 7255380.79) < 0.02, s"AAPS E ${6e6 + bx}")
    assert(math.abs(6e6 + by - 7053389.56) < 0.02, s"AAPS N ${6e6 + by}")
    // 3. GDA Technical Manual §4 worked example, Flinders Peak → MGA
    //    zone 55 (GRS80; Δf vs WGS84 moves E/N by ~0.1 mm, far below the
    //    printed mm): φ=−37°57′03.7203″ λ=144°25′29.5244″ →
    //    E=273 741.297, N=5 796 489.777.
    val lat = -(37.0 + 57.0 / 60 + 3.7203 / 3600)
    val lon = 144.0 + 25.0 / 60 + 29.5244 / 3600
    val (fx, fy) = Proj.of("EPSG:32755").forward(lon, lat)
    assert(math.abs(fx - 273741.297) < 2e-3, s"MGA55 E $fx")
    assert(math.abs(fy - 5796489.777) < 2e-3, s"MGA55 N $fy")
  }

  test("ellipsoid: Krüger roundtrip holds at 1e-9° and PS-ell at the pole-true limit") {
    // the +lat_ts=90 limit form (Snyder 21-39) must agree with the
    // lat_ts→90 continuous limit
    val pole = PolarStereoEll(north = true, 90.0, 0.0)
    val near = PolarStereoEll(north = true, 89.9999, 0.0)
    val (x1, y1) = pole.forward(33.0, 75.0); val (x2, y2) = near.forward(33.0, 75.0)
    assert(math.hypot(x1 - x2, y1 - y2) / math.hypot(x1, y1) < 1e-8)
    val (lo, la) = pole.inverse(x1, y1)
    assert(math.abs(lo - 33.0) < 1e-9 && math.abs(la - 75.0) < 1e-9)
  }

  test("WKT1/WKT2 strings resolve to the same projections as their EPSG twins") {
    // WKT1 with parameters only (no authority): the parameter branch
    val utmWkt1 = """PROJCS["WGS 84 / UTM zone 10N",
      GEOGCS["WGS 84", DATUM["WGS_1984",
        SPHEROID["WGS 84",6378137,298.257223563]],
        PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
      PROJECTION["Transverse_Mercator"],
      PARAMETER["latitude_of_origin",0],
      PARAMETER["central_meridian",-123],
      PARAMETER["scale_factor",0.9996],
      PARAMETER["false_easting",500000],
      PARAMETER["false_northing",0],
      UNIT["metre",1], AXIS["Easting",EAST], AXIS["Northing",NORTH]]"""
    // WKT1 with a root AUTHORITY: the authority shortcut
    val utmWkt1Auth = utmWkt1.dropRight(1) + """, AUTHORITY["EPSG","32610"]]"""
    // WKT2 (PROJCRS / CONVERSION / METHOD, "" quote escape in the name)
    val utmWkt2 = """PROJCRS["WGS 84 / UTM ""zone"" 10N",
      BASEGEOGCRS["WGS 84", DATUM["World Geodetic System 1984",
        ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]]],
      CONVERSION["UTM zone 10N",
        METHOD["Transverse Mercator",ID["EPSG",9807]],
        PARAMETER["Latitude of natural origin",0],
        PARAMETER["Longitude of natural origin",-123],
        PARAMETER["Scale factor at natural origin",0.9996],
        PARAMETER["False easting",500000],
        PARAMETER["False northing",0]],
      CS[Cartesian,2]]"""
    // WKT1 polar stereo (lat_ts rides in latitude_of_origin — GDAL form)
    val psWkt1 = """PROJCS["WGS 84 / NSIDC Sea Ice Polar Stereographic North",
      GEOGCS["WGS 84", DATUM["WGS_1984",
        SPHEROID["WGS 84",6378137,298.257223563]],
        PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
      PROJECTION["Polar_Stereographic"],
      PARAMETER["latitude_of_origin",70],
      PARAMETER["central_meridian",-45],
      PARAMETER["false_easting",0], PARAMETER["false_northing",0],
      UNIT["metre",1]]"""
    val psSouth = """PROJCS["WGS 84 / Antarctic Polar Stereographic",
      GEOGCS["WGS 84", DATUM["WGS_1984",
        SPHEROID["WGS 84",6378137,298.257223563]],
        PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
      PROJECTION["Polar_Stereographic"],
      PARAMETER["latitude_of_origin",-71],
      PARAMETER["central_meridian",0],
      UNIT["metre",1], AUTHORITY["EPSG","3031"]]"""
    for ((wkt, epsg, pt) <- Seq(
        (utmWkt1, "EPSG:32610", (-123.4, 47.1)),
        (utmWkt1Auth, "EPSG:32610", (-123.4, 47.1)),
        (utmWkt2, "EPSG:32610", (-122.0, 38.5)),
        (psWkt1, "EPSG:3413", (-40.0, 75.0)),
        (psSouth, "EPSG:3031", (10.0, -80.0)))) {
      assert(Proj.of(wkt).forward(pt._1, pt._2) ==
        Proj.of(epsg).forward(pt._1, pt._2), s"WKT vs $epsg")
      // and under the spherical datum mode too
      assert(Proj.of(wkt, Proj.Sphere).forward(pt._1, pt._2) ==
        Proj.of(epsg, Proj.Sphere).forward(pt._1, pt._2), s"WKT vs $epsg sphere")
    }
    // geographic roots short-circuit
    assert(Proj.of("""GEOGCS["WGS 84", DATUM["WGS_1984",
      SPHEROID["WGS 84",6378137,298.257223563]], PRIMEM["Greenwich",0],
      UNIT["degree",0.0174532925199433], AUTHORITY["EPSG","4326"]]""")
      == Geographic)
    // a spheroid NAMED sphere pins the spherical form regardless of mode
    val sphWkt = """PROJCS["sphere tmerc",
      GEOGCS["unnamed", DATUM["unnamed", SPHEROID["sphere",6371008.8,0]],
        PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
      PROJECTION["Transverse_Mercator"],
      PARAMETER["central_meridian",-123], PARAMETER["scale_factor",0.9996],
      PARAMETER["false_easting",500000], PARAMETER["false_northing",0]]"""
    assert(Proj.of(sphWkt).isInstanceOf[TmercSphere])
    // unsupported forms fail LOUDLY, never a silent identity
    intercept[IllegalArgumentException] {
      Proj.of("""PROJCS["x", PROJECTION["Albers_Conic_Equal_Area"],
        PARAMETER["standard_parallel_1",29.5]]""")
    }
    intercept[IllegalArgumentException] {
      Proj.of("""PROJCS["x", PROJECTION["Transverse_Mercator"],
        PARAMETER["latitude_of_origin",49],
        PARAMETER["central_meridian",-2]]""")
    }
  }
}

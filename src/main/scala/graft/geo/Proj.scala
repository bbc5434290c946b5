package graft.geo

/** Deterministic map projections with CLOSED-FORM inverses — the engine's
  * reprojection kernel for cross-CRS warps (the reference defers this to
  * PROJ via `gdal.ReprojectImage`, `warplib.py:196`, with the target SRS
  * resolved by `parse_srs`, `warplib.py:264-310`). Two datum families
  * behind one trait: the WGS84-ELLIPSOID forms ([[TmercKruger]],
  * [[PolarStereoEll]] — the default, matching the reference's PROJ-backed
  * placements to sub-micrometer) and the mean-sphere forms below (the
  * documented fallback; <0.3 % positional error that cancels in A→B→A).
  *
  * Design constraints, in order:
  *   1. DETERMINISTIC — same bits on every executor, partition-stable, and
  *      re-derivable in an independent engine (the q102 oracle replays these
  *      exact formula chains in DuckDB SQL);
  *   2. INVERTIBLE in closed form (warp inverse-projects target pixel
  *      centers; an iterative inverse would put a convergence tolerance in
  *      the value path);
  *   3. CONSISTENT with the existing scalar family: the same mean-sphere
  *      radius as `Srs.localTmerc`/`Srs.haversineM`, and the transverse
  *      Mercator forward IS `localtmerc` (`geolib.py:122-127`) scaled by k0
  *      with UTM false offsets.
  *
  * Spherical forms (Snyder, "Map Projections — A Working Manual", USGS PP
  * 1395: eqs 8-5/8-6 for transverse Mercator, 21-3/21-4 + 20-14..20-18 for
  * polar stereographic). The ellipsoidal-vs-spherical positional error is
  * <0.3 % — the same documented trade as `Srs.localOrtho` — and is
  * IDENTICAL in forward and inverse, so A→B→A round trips are exact to
  * floating-point, which is what grid alignment actually needs. */
sealed trait Proj {
  /** (lon°, lat°) → projected map coordinates. */
  def forward(lon: Double, lat: Double): (Double, Double)
  /** Projected map coordinates → (lon°, lat°). */
  def inverse(x: Double, y: Double): (Double, Double)
}

/** Geographic CRS: map units ARE degrees. */
case object Geographic extends Proj {
  def forward(lon: Double, lat: Double): (Double, Double) = (lon, lat)
  def inverse(x: Double, y: Double): (Double, Double) = (x, y)
}

/** Spherical transverse Mercator (lat0 = 0): the UTM family.
  * Forward: B = cos φ · sin Δλ; x = FE + k0·R·atanh(B) with
  * atanh(B) = ½·ln((1+B)/(1−B)) (the exact op chain of `Srs.localTmerc`);
  * y = FN + k0·R·atan2(tan φ, cos Δλ).
  * Inverse: D = (y−FN)/(k0·R), x' = (x−FE)/(k0·R);
  * φ = asin(sin D / cosh x'), λ = λ0 + atan2(sinh x', cos D). */
final case class TmercSphere(lon0: Double, k0: Double, fe: Double, fn: Double)
    extends Proj {
  private val kR = k0 * Proj.R
  def forward(lon: Double, lat: Double): (Double, Double) = {
    val dl = math.toRadians(lon - lon0); val lr = math.toRadians(lat)
    val b = math.cos(lr) * math.sin(dl)
    (fe + kR * (0.5 * math.log((1 + b) / (1 - b))),
     fn + kR * math.atan2(math.tan(lr), math.cos(dl)))
  }
  def inverse(x: Double, y: Double): (Double, Double) = {
    val xp = (x - fe) / kR; val d = (y - fn) / kR
    (lon0 + math.toDegrees(math.atan2(math.sinh(xp), math.cos(d))),
     math.toDegrees(math.asin(math.sin(d) / math.cosh(xp))))
  }
}

/** Spherical polar stereographic, true at `latTs`.
  * North: ρ = 2·R·k0·tan(π/4 − φ/2), x = ρ·sin Δλ, y = −ρ·cos Δλ,
  * k0 = (1 + sin φts)/2; inverse φ = 90° − 2·atan(ρ/(2·R·k0)),
  * λ = λ0 + atan2(x, −y). South mirrors (φ → −φ, y → −y). */
final case class PolarStereoSphere(north: Boolean, latTs: Double, lon0: Double)
    extends Proj {
  private val k0 = (1.0 + math.sin(math.toRadians(math.abs(latTs)))) / 2.0
  private val rk2 = 2.0 * Proj.R * k0
  def forward(lon: Double, lat: Double): (Double, Double) = {
    val dl = math.toRadians(lon - lon0)
    val phi = math.toRadians(if (north) lat else -lat)
    val rho = rk2 * math.tan(math.Pi / 4 - phi / 2)
    val x = rho * math.sin(dl); val y = -rho * math.cos(dl)
    (x, if (north) y else -y)
  }
  def inverse(x: Double, y: Double): (Double, Double) = {
    val yn = if (north) y else -y
    val rho = math.hypot(x, yn)
    val phi = math.Pi / 2 - 2 * math.atan(rho / rk2)
    val lat = math.toDegrees(phi)
    (lon0 + math.toDegrees(math.atan2(x, -yn)),
     if (north) lat else -lat)
  }
}

/** Spherical (web) Mercator — EPSG:3857's spherical form: x = R·Δλ(rad),
  * y = R·ln tan(π/4 + φ/2); inverse φ = 2·atan(exp(y/R)) − π/2. */
final case class MercatorSphere(lon0: Double) extends Proj {
  def forward(lon: Double, lat: Double): (Double, Double) =
    (Proj.R * math.toRadians(lon - lon0),
     Proj.R * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2)))
  def inverse(x: Double, y: Double): (Double, Double) =
    (lon0 + math.toDegrees(x / Proj.R),
     math.toDegrees(2 * math.atan(math.exp(y / Proj.R)) - math.Pi / 2))
}

/** WGS84 ellipsoid constants + the series shared by the ellipsoidal
  * projections. All coefficients are closed-form polynomials in the third
  * flattening n (Krüger 1912; the order-n⁶ tabulation in Karney,
  * "Transverse Mercator with an accuracy of a few nanometers", J. Geodesy
  * 85 (2011), eqs 35-36) — public textbook content, re-derived here.
  * ProjSpec anchors the whole family against INDEPENDENT computations:
  * the rectifying radius against the published WGS84 quarter-meridian,
  * central-meridian northings against direct numerical quadrature of the
  * meridian-arc integrand, and the χ→φ series against the exact
  * atanh-form conformal latitude. */
object Ellipsoid {
  val a = 6378137.0                    // WGS84 semi-major axis (m)
  val f = 1.0 / 298.257223563          // WGS84 flattening
  val e2 = f * (2.0 - f)               // first eccentricity squared
  val e = math.sqrt(e2)
  val n = f / (2.0 - f)                // third flattening

  /** Rectifying radius A: meridian quadrant = A·π/2. */
  val A = {
    val n2 = n * n
    a / (1.0 + n) * (1.0 + n2 / 4.0 + n2 * n2 / 64.0 + n2 * n2 * n2 / 256.0)
  }

  private def poly(c: Double*) = c.zipWithIndex.map { case (ci, k) =>
    ci * math.pow(n, k) }.sum

  /** Forward Krüger series ξ/η ← ξ'/η' (α₁..α₆, each × nʲ..n⁶). */
  val alpha: Array[Double] = Array(
    n * poly(1.0 / 2, -2.0 / 3, 5.0 / 16, 41.0 / 180, -127.0 / 288, 7891.0 / 37800),
    n * n * poly(13.0 / 48, -3.0 / 5, 557.0 / 1440, 281.0 / 630, -1983433.0 / 1935360),
    math.pow(n, 3) * poly(61.0 / 240, -103.0 / 140, 15061.0 / 26880, 167603.0 / 181440),
    math.pow(n, 4) * poly(49561.0 / 161280, -179.0 / 168, 6601661.0 / 7257600),
    math.pow(n, 5) * poly(34729.0 / 80640, -3418889.0 / 1995840),
    math.pow(n, 6) * poly(212378941.0 / 319334400))

  /** Inverse Krüger series ξ'/η' ← ξ/η (β₁..β₆). */
  val beta: Array[Double] = Array(
    n * poly(1.0 / 2, -2.0 / 3, 37.0 / 96, -1.0 / 360, -81.0 / 512, 96199.0 / 604800),
    n * n * poly(1.0 / 48, 1.0 / 15, -437.0 / 1440, 46.0 / 105, -1118711.0 / 3870720),
    math.pow(n, 3) * poly(17.0 / 480, -37.0 / 840, -209.0 / 4480, 5569.0 / 90720),
    math.pow(n, 4) * poly(4397.0 / 161280, -11.0 / 504, -830251.0 / 7257600),
    math.pow(n, 5) * poly(4583.0 / 161280, -108847.0 / 3991680),
    math.pow(n, 6) * poly(20648693.0 / 638668800))

  /** Conformal → geodetic latitude series φ = χ + Σ δⱼ sin 2jχ (δ₁..δ₆) —
    * shared by the Krüger inverse and the ellipsoidal polar-stereo inverse
    * (both land on χ first; Snyder's eq 3-5 is the e²-power form of the
    * same series). */
  val delta: Array[Double] = Array(
    n * poly(2.0, -2.0 / 3, -2.0, 116.0 / 45, 26.0 / 45, -2854.0 / 675),
    n * n * poly(7.0 / 3, -8.0 / 5, -227.0 / 45, 2704.0 / 315, 2323.0 / 945),
    math.pow(n, 3) * poly(56.0 / 15, -136.0 / 35, -1262.0 / 105, 73814.0 / 2835),
    math.pow(n, 4) * poly(4279.0 / 630, -332.0 / 35, -399572.0 / 14175),
    math.pow(n, 5) * poly(4174.0 / 315, -144838.0 / 6237),
    math.pow(n, 6) * poly(601676.0 / 22275))

  def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))

  /** Exact conformal latitude: tan χ = sinh(atanh sinφ − e·atanh(e sinφ)). */
  def conformalTan(phi: Double): Double = {
    val s = math.sin(phi)
    math.sinh(atanh(s) - e * atanh(e * s))
  }

  /** Geodetic latitude from conformal latitude via the δ series. */
  def geodeticLat(chi: Double): Double = {
    var phi = chi
    var j = 1
    while (j <= 6) { phi += delta(j - 1) * math.sin(2.0 * j * chi); j += 1 }
    phi
  }

  /** Snyder 15-9: the polar-stereo half-angle function
    * t = tan(π/4 − φ/2) / [(1 − e sinφ)/(1 + e sinφ)]^(e/2). */
  def psT(phi: Double): Double = {
    val s = e * math.sin(phi)
    math.tan(math.Pi / 4 - phi / 2) /
      math.pow((1.0 - s) / (1.0 + s), e / 2)
  }
}

/** Ellipsoidal (WGS84) transverse Mercator — the Krüger n-series to order
  * n⁶ (sub-micrometer within a UTM zone), forward AND inverse in closed
  * form (series of sinh/cosh/atan2, no iteration): the engine's fidelity
  * match for the reference's PROJ-backed UTM warps (`warplib.py:196`).
  * Forward: conformal latitude (exact atanh form) → ξ' = atan2(t, cos Δλ),
  * η' = atanh(sin Δλ / √(1+t²)) → Krüger α series → E/N. Inverse: β series
  * → χ = asin(sin ξ'/cosh η') → δ series → φ. */
final case class TmercKruger(lon0: Double, k0: Double, fe: Double, fn: Double)
    extends Proj {
  import Ellipsoid._
  private val kA = k0 * A
  def forward(lon: Double, lat: Double): (Double, Double) = {
    val dl = math.toRadians(lon - lon0); val phi = math.toRadians(lat)
    val t = conformalTan(phi)
    val xip = math.atan2(t, math.cos(dl))
    val etap = atanh(math.sin(dl) / math.sqrt(1.0 + t * t))
    var xi = xip; var eta = etap
    var j = 1
    while (j <= 6) {
      xi += alpha(j - 1) * math.sin(2.0 * j * xip) * math.cosh(2.0 * j * etap)
      eta += alpha(j - 1) * math.cos(2.0 * j * xip) * math.sinh(2.0 * j * etap)
      j += 1
    }
    (fe + kA * eta, fn + kA * xi)
  }
  def inverse(x: Double, y: Double): (Double, Double) = {
    val xi = (y - fn) / kA; val eta = (x - fe) / kA
    var xip = xi; var etap = eta
    var j = 1
    while (j <= 6) {
      xip -= beta(j - 1) * math.sin(2.0 * j * xi) * math.cosh(2.0 * j * eta)
      etap -= beta(j - 1) * math.cos(2.0 * j * xi) * math.sinh(2.0 * j * eta)
      j += 1
    }
    val chi = math.asin(math.sin(xip) / math.cosh(etap))
    (lon0 + math.toDegrees(math.atan2(math.sinh(etap), math.cos(xip))),
     math.toDegrees(geodeticLat(chi)))
  }
}

/** Ellipsoidal (WGS84) polar stereographic, true at `latTs` — Snyder
  * 21-27..21-40 (USGS PP 1395): ρ = a·m_c·t/t_c with m = cos φ/√(1−e²sin²φ),
  * x = ρ sin Δλ, y = −ρ cos Δλ (north aspect; south mirrors φ and y, the
  * same convention as [[PolarStereoSphere]]). Inverse: t = ρ·t_c/(a·m_c),
  * χ = π/2 − 2 atan t, then the shared δ series → φ. latTs = ±90 uses the
  * Snyder 21-39 pole-true limit 2a/√((1+e)^(1+e)(1−e)^(1−e)). */
final case class PolarStereoEll(north: Boolean, latTs: Double, lon0: Double)
    extends Proj {
  import Ellipsoid._
  private val phiC = math.toRadians(math.abs(latTs))
  /** a·m_c/t_c — the single constant the per-point chain needs. */
  val aMoverT: Double =
    if (math.abs(latTs) >= 90.0 - 1e-9)
      2.0 * a / math.sqrt(math.pow(1.0 + e, 1.0 + e) * math.pow(1.0 - e, 1.0 - e))
    else {
      val mC = math.cos(phiC) / math.sqrt(1.0 - e2 * math.sin(phiC) * math.sin(phiC))
      a * mC / psT(phiC)
    }
  def forward(lon: Double, lat: Double): (Double, Double) = {
    val dl = math.toRadians(lon - lon0)
    val phi = math.toRadians(if (north) lat else -lat)
    val rho = aMoverT * psT(phi)
    val x = rho * math.sin(dl); val y = -rho * math.cos(dl)
    (x, if (north) y else -y)
  }
  def inverse(x: Double, y: Double): (Double, Double) = {
    val yn = if (north) y else -y
    val rho = math.hypot(x, yn)
    val chi = math.Pi / 2 - 2.0 * math.atan(rho / aMoverT)
    val lat = math.toDegrees(Ellipsoid.geodeticLat(chi))
    (lon0 + math.toDegrees(math.atan2(x, -yn)), if (north) lat else -lat)
  }
}

object Proj {
  /** WGS84 mean-sphere radius — shared with `Srs.localTmerc`/`haversineM`. */
  val R = 6371008.8

  /** Datum modes: `Wgs84` (default) projects on the WGS84 ellipsoid —
    * Krüger-series transverse Mercator, Snyder ellipsoidal polar stereo —
    * matching the reference's PROJ-backed placements; `Sphere` is the
    * r4/r5 mean-sphere family, kept as the documented fallback (exact
    * closed forms, the q102 oracle chain). Geographic and EPSG:3857 are
    * datum-invariant (3857 is spherical BY DEFINITION). */
  val Wgs84 = "wgs84"
  val Sphere = "sphere"

  private val UtmN = "EPSG:326(\\d\\d)".r
  private val UtmS = "EPSG:327(\\d\\d)".r

  /** Projection for a CRS id. Registered: geographic (4326 family), the UTM
    * zones (326xx/327xx; lon0 = zone·6 − 183, k0 = 0.9996, FE = 500 km,
    * FN = 0/10 000 km), and the two polar-stereo workhorses the reference's
    * data lives in (3413 north lat_ts 70 lon0 −45; 3031 south lat_ts −71).
    * `datum` picks the WGS84-ellipsoid forms (default) or the mean-sphere
    * fallback. Anything else is a LOUD error — a silent identity would warp
    * pixels into the wrong hemisphere. */
  def of(crs: String, datum: String = Wgs84): Proj = {
    val ell = datum match {
      case Wgs84 | "ellipsoidal" => true
      case Sphere => false
      case d => throw new IllegalArgumentException(s"unknown datum '$d'")
    }
    def tmerc(lon0: Double, k0: Double, fe: Double, fn: Double): Proj =
      if (ell) TmercKruger(lon0, k0, fe, fn) else TmercSphere(lon0, k0, fe, fn)
    def stere(north: Boolean, latTs: Double, lon0: Double): Proj =
      if (ell) PolarStereoEll(north, latTs, lon0)
      else PolarStereoSphere(north, latTs, lon0)
    crs match {
      case c if Srs.isGeographic(c) => Geographic
      case UtmN(z) => tmerc(z.toInt * 6 - 183, 0.9996, 500000.0, 0.0)
      case UtmS(z) => tmerc(z.toInt * 6 - 183, 0.9996, 500000.0, 1e7)
      case "EPSG:3413" => stere(north = true, 70.0, -45.0)
      case "EPSG:3031" => stere(north = false, -71.0, 0.0)
      case "EPSG:3857" | "EPSG:900913" => MercatorSphere(0.0)
      case p4 if p4.startsWith("+proj=") => fromProj4(p4, ell)
      case w if isWkt(w) => fromWkt(w, ell)
      case other => throw new IllegalArgumentException(
        s"no deterministic projection registered for CRS '$other'")
    }
  }

  /** `parse_srs` accepts WKT text too (`ImportFromWkt`, warplib.py:304-306). */
  private def isWkt(s: String): Boolean = {
    val t = s.trim.toUpperCase
    Seq("PROJCS[", "GEOGCS[", "PROJCRS[", "GEOGCRS[", "GEODCRS[")
      .exists(t.startsWith)
  }

  // ------------------------------------------------------------------ WKT
  // Minimal WKT1 / WKT2 CRS parser for the families this engine projects —
  // the `parse_srs` ImportFromWkt branch (warplib.py:304-306). The grammar
  // is NODE[arg, ...] with quoted strings, numbers, bare enum keywords and
  // nested nodes; [] and () are interchangeable, keywords case-insensitive
  // (both facts from the public OGC 18-010r7 / ISO 19162 spec).
  private sealed trait WktNode
  private final case class WktObj(name: String, args: List[WktNode]) extends WktNode
  private final case class WktStr(s: String) extends WktNode
  private final case class WktNum(v: Double) extends WktNode

  private def parseWkt(s: String): WktObj = {
    var i = 0
    def err(msg: String) = throw new IllegalArgumentException(
      s"WKT parse error at ${math.min(i, s.length)}: $msg")
    def ws(): Unit = while (i < s.length && (s(i).isWhitespace || s(i) == ',')) i += 1
    def node(): WktNode = {
      ws()
      if (i >= s.length) err("unexpected end")
      s(i) match {
        case '"' =>
          i += 1; val b = new StringBuilder
          // WKT escapes a literal quote as "" (doubled)
          var done = false
          while (!done) {
            if (i >= s.length) err("unterminated string")
            else if (s(i) == '"' && i + 1 < s.length && s(i + 1) == '"') {
              b.append('"'); i += 2
            } else if (s(i) == '"') { i += 1; done = true }
            else { b.append(s(i)); i += 1 }
          }
          WktStr(b.toString)
        case c if c == '-' || c == '+' || c == '.' || c.isDigit =>
          val j = i
          while (i < s.length && "+-.eE0123456789".indexOf(s(i)) >= 0) i += 1
          WktNum(java.lang.Double.parseDouble(s.substring(j, i)))
        case _ =>
          val j = i
          while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
          if (i == j) err(s"unexpected '${s(i)}'")
          val name = s.substring(j, i)
          ws()
          if (i < s.length && (s(i) == '[' || s(i) == '(')) {
            val close = if (s(i) == '[') ']' else ')'
            i += 1
            val args = List.newBuilder[WktNode]
            ws()
            while (i < s.length && s(i) != close) { args += node(); ws() }
            if (i >= s.length) err(s"missing '$close'")
            i += 1
            WktObj(name.toUpperCase, args.result())
          } else WktStr(name) // bare enum keyword (NORTH, EAST, ...)
      }
    }
    node() match {
      case o: WktObj => o
      case _ => err("top-level WKT must be an object")
    }
  }

  private def wktFind(n: WktNode, names: Set[String]): Seq[WktObj] = n match {
    case o: WktObj =>
      (if (names(o.name)) Seq(o) else Nil) ++
        o.args.flatMap(wktFind(_, names))
    case _ => Nil
  }

  /** Lowercased alnum-only normalization for method/parameter names —
    * WKT1 "Transverse_Mercator" and WKT2 "Transverse Mercator" collapse. */
  private def wktNorm(s: String): String =
    s.toLowerCase.filter(_.isLetterOrDigit)

  /** WKT1/WKT2 → the registered projection families. Resolution order:
    * (1) a top-level EPSG AUTHORITY/ID that names a registered CRS wins
    * (authority codes are authoritative over possibly-rounded parameter
    * text); (2) otherwise PROJECTION/METHOD + PARAMETERs map onto the
    * tmerc / polar-stereo / mercator forms; geographic roots go straight
    * to [[Geographic]]. A SPHEROID/ELLIPSOID named "sphere" (or with
    * inverse flattening 0) pins the spherical forms, like proj4's
    * `+ellps=sphere`. Unsupported methods or parameters (non-zero tmerc
    * latitude of origin, polar-stereo false offsets) are LOUD errors. */
  private[geo] def fromWkt(wkt: String, ellDefault: Boolean = true): Proj = {
    val root = parseWkt(wkt)
    if (Set("GEOGCS", "GEOGCRS", "GEODCRS")(root.name)) return Geographic
    require(root.name == "PROJCS" || root.name == "PROJCRS",
      s"unsupported WKT root ${root.name}")
    // (1) top-level authority shortcut — only the ROOT's own id (a nested
    // GEOGCS/DATUM id must not hijack the projected CRS)
    val rootId = root.args.collectFirst {
      case WktObj(n, List(WktStr(auth), code)) if (n == "AUTHORITY" || n == "ID") &&
          auth.equalsIgnoreCase("EPSG") =>
        code match { case WktStr(c) => c; case WktNum(v) => v.toLong.toString; case _ => "" }
    }
    rootId.foreach { code =>
      try return of(s"EPSG:$code", if (ellDefault) Wgs84 else Sphere)
      catch { case _: IllegalArgumentException => () } // unregistered: use params
    }
    // (2) method + parameters
    val ell = ellDefault && !wktFind(root, Set("SPHEROID", "ELLIPSOID")).exists {
      case WktObj(_, WktStr(name) :: _ :: rest) =>
        name.toLowerCase.contains("sphere") ||
          rest.headOption.exists { case WktNum(invf) => invf == 0.0; case _ => false }
      case _ => false
    }
    val method = wktFind(root, Set("PROJECTION", "METHOD")).flatMap(_.args).collectFirst {
      case WktStr(m) => wktNorm(m)
    }.getOrElse(throw new IllegalArgumentException("WKT lacks PROJECTION/METHOD"))
    val params: Map[String, Double] = wktFind(root, Set("PARAMETER")).collect {
      case WktObj(_, WktStr(k) :: WktNum(v) :: _) => wktNorm(k) -> v
    }.toMap
    def p(dflt: Double, keys: String*): Double =
      keys.flatMap(params.get).headOption.getOrElse(dflt)
    val lon0 = p(0, "centralmeridian", "longitudeofnaturalorigin", "longitudeoforigin")
    val fe = p(0, "falseeasting")
    val fn = p(0, "falsenorthing")
    method match {
      case "transversemercator" =>
        val lat0 = p(0, "latitudeofnaturalorigin", "latitudeoforigin")
        require(lat0 == 0.0,
          s"WKT tmerc with non-zero latitude of origin ($lat0) is not a registered form")
        val k0 = p(1.0, "scalefactor", "scalefactoratnaturalorigin")
        if (ell) TmercKruger(lon0, k0, fe, fn) else TmercSphere(lon0, k0, fe, fn)
      case m if m.startsWith("polarstereographic") =>
        require(fe == 0.0 && fn == 0.0,
          s"WKT polar stereo with false offsets ($fe, $fn) is not a registered form")
        // WKT1 carries the standard parallel in latitude_of_origin; WKT2
        // variant B names it explicitly
        val latTs = p(p(90, "latitudeofnaturalorigin", "latitudeoforigin"),
          "latitudeofstandardparallel", "standardparallel1")
        val north = latTs >= 0
        if (ell) PolarStereoEll(north, latTs, lon0)
        else PolarStereoSphere(north, latTs, lon0)
      case m if m.startsWith("mercator") || m == "popularvisualisationpseudomercator" =>
        MercatorSphere(lon0)
      case other => throw new IllegalArgumentException(
        s"no deterministic projection for WKT method '$other'")
    }
  }

  /** Minimal proj4-string resolution — the `parse_srs` breadth the
    * reference accepts (`warplib.py:264-310` hands proj4 to osr): the
    * families this engine projects, with their standard parameters. An
    * explicit `+ellps=sphere` or `+R=` pins the spherical form regardless
    * of the datum mode (PROJ semantics); otherwise `ell` decides.
    * Unknown `+proj=` values stay a loud error. */
  private[geo] def fromProj4(p4: String, ellDefault: Boolean = true): Proj = {
    val kv = p4.trim.split("\\s+").collect {
      case t if t.startsWith("+") && t.contains("=") =>
        val Array(k, v) = t.stripPrefix("+").split("=", 2); k -> v
      case t if t.startsWith("+") => t.stripPrefix("+") -> "" // bare flags (+south, +no_defs)
    }.toMap
    val ell = !(kv.get("ellps").contains("sphere") || kv.contains("R")) &&
      ellDefault
    def d(k: String, dflt: Double) = kv.get(k).map(_.toDouble).getOrElse(dflt)
    def tmerc(lon0: Double, k0: Double, fe: Double, fn: Double): Proj =
      if (ell) TmercKruger(lon0, k0, fe, fn) else TmercSphere(lon0, k0, fe, fn)
    kv.getOrElse("proj", "?") match {
      case "longlat" | "latlong" => Geographic
      case "utm" =>
        val zone = kv.getOrElse("zone",
          throw new IllegalArgumentException(s"proj4 utm needs +zone: $p4")).toInt
        tmerc(zone * 6 - 183, 0.9996, 500000.0,
          if (kv.contains("south")) 1e7 else 0.0)
      case "tmerc" =>
        tmerc(d("lon_0", 0), d("k_0", d("k", 1.0)), d("x_0", 0), d("y_0", 0))
      case "stere" =>
        val lat0 = d("lat_0", 90)
        if (ell) PolarStereoEll(lat0 >= 0, d("lat_ts", lat0), d("lon_0", 0))
        else PolarStereoSphere(lat0 >= 0, d("lat_ts", lat0), d("lon_0", 0))
      case "merc" => MercatorSphere(d("lon_0", 0))
      case other => throw new IllegalArgumentException(
        s"no deterministic projection for +proj=$other ('$p4')")
    }
  }

  /** Point transform src → dst (identity short-circuit when equal). */
  def transform(src: String, dst: String,
                datum: String = Wgs84): (Double, Double) => (Double, Double) =
    if (src == dst) (x, y) => (x, y)
    else {
      val s = of(src, datum); val d = of(dst, datum)
      (x, y) => { val (lon, lat) = s.inverse(x, y); d.forward(lon, lat) }
    }

  /** Bounding box of `e` seen in `dst`: min/max over a DENSIFIED boundary
    * (n samples per edge) — projected edges curve, so corners alone
    * under-cover (the standard `gdal.Warp` bbox densification idea). */
  def projectExtent(e: Extent, src: String, dst: String, n: Int = 21,
                    datum: String = Wgs84): Extent = {
    if (src == dst) return e
    val t = transform(src, dst, datum)
    var xmin = Double.MaxValue; var ymin = Double.MaxValue
    var xmax = -Double.MaxValue; var ymax = -Double.MaxValue
    var i = 0
    while (i <= n) {
      val f = i.toDouble / n
      val pts = Array(
        (e.xmin + f * (e.xmax - e.xmin), e.ymin),  // south edge
        (e.xmin + f * (e.xmax - e.xmin), e.ymax),  // north edge
        (e.xmin, e.ymin + f * (e.ymax - e.ymin)),  // west edge
        (e.xmax, e.ymin + f * (e.ymax - e.ymin)))  // east edge
      var j = 0
      while (j < 4) {
        val (x, y) = t(pts(j)._1, pts(j)._2)
        if (x < xmin) xmin = x; if (x > xmax) xmax = x
        if (y < ymin) ymin = y; if (y > ymax) ymax = y
        j += 1
      }
      i += 1
    }
    Extent(xmin, ymin, xmax, ymax)
  }

  /** One source pixel step seen in `dst` units at the grid center — the
    * cross-CRS analog of "this image's resolution" for `parse_res`
    * strategies (the reference's `geolib.get_res` with `t_srs`,
    * geolib.py:1118-1133: GDAL reprojects the geotransform; here it is the
    * projected x-step at the center pixel, deterministic and replayable). */
  def resIn(g: GridSpec, dst: String, datum: String = Wgs84): Double = {
    if (g.crs == dst) return g.res
    val t = transform(g.crs, dst, datum)
    val (cx, cy) = g.pixelToMap(g.w / 2, g.h / 2)
    val (x0, y0) = t(cx, cy)
    val (x1, y1) = t(cx + g.res, cy)
    math.hypot(x1 - x0, y1 - y0)
  }
}

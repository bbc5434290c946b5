package graft.geo

/** Deterministic spherical map projections with CLOSED-FORM inverses — the
  * engine's reprojection kernel for cross-CRS warps (the reference defers
  * this to PROJ via `gdal.ReprojectImage`, `warplib.py:196`, with the target
  * SRS resolved by `parse_srs`, `warplib.py:264-310`).
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

object Proj {
  /** WGS84 mean-sphere radius — shared with `Srs.localTmerc`/`haversineM`. */
  val R = 6371008.8

  private val UtmN = "EPSG:326(\\d\\d)".r
  private val UtmS = "EPSG:327(\\d\\d)".r

  /** Projection for a CRS id. Registered: geographic (4326 family), the UTM
    * zones (326xx/327xx; lon0 = zone·6 − 183, k0 = 0.9996, FE = 500 km,
    * FN = 0/10 000 km), and the two polar-stereo workhorses the reference's
    * data lives in (3413 north lat_ts 70 lon0 −45; 3031 south lat_ts −71).
    * Anything else is a LOUD error — a silent identity would warp pixels
    * into the wrong hemisphere. */
  def of(crs: String): Proj = crs match {
    case c if Srs.isGeographic(c) => Geographic
    case UtmN(z) => TmercSphere(z.toInt * 6 - 183, 0.9996, 500000.0, 0.0)
    case UtmS(z) => TmercSphere(z.toInt * 6 - 183, 0.9996, 500000.0, 1e7)
    case "EPSG:3413" => PolarStereoSphere(north = true, 70.0, -45.0)
    case "EPSG:3031" => PolarStereoSphere(north = false, -71.0, 0.0)
    case "EPSG:3857" | "EPSG:900913" => MercatorSphere(0.0)
    case p4 if p4.startsWith("+proj=") => fromProj4(p4)
    case other => throw new IllegalArgumentException(
      s"no deterministic projection registered for CRS '$other'")
  }

  /** Minimal proj4-string resolution — the `parse_srs` breadth the
    * reference accepts (`warplib.py:264-310` hands proj4 to osr): the
    * families this engine projects, with their standard parameters.
    * Unknown `+proj=` values stay a loud error. */
  private[geo] def fromProj4(p4: String): Proj = {
    val kv = p4.trim.split("\\s+").collect {
      case t if t.startsWith("+") && t.contains("=") =>
        val Array(k, v) = t.stripPrefix("+").split("=", 2); k -> v
      case t if t.startsWith("+") => t.stripPrefix("+") -> "" // bare flags (+south, +no_defs)
    }.toMap
    def d(k: String, dflt: Double) = kv.get(k).map(_.toDouble).getOrElse(dflt)
    kv.getOrElse("proj", "?") match {
      case "longlat" | "latlong" => Geographic
      case "utm" =>
        val zone = kv.getOrElse("zone",
          throw new IllegalArgumentException(s"proj4 utm needs +zone: $p4")).toInt
        TmercSphere(zone * 6 - 183, 0.9996, 500000.0,
          if (kv.contains("south")) 1e7 else 0.0)
      case "tmerc" =>
        TmercSphere(d("lon_0", 0), d("k_0", d("k", 1.0)), d("x_0", 0), d("y_0", 0))
      case "stere" =>
        val lat0 = d("lat_0", 90)
        PolarStereoSphere(lat0 >= 0, d("lat_ts", lat0), d("lon_0", 0))
      case "merc" => MercatorSphere(d("lon_0", 0))
      case other => throw new IllegalArgumentException(
        s"no deterministic projection for +proj=$other ('$p4')")
    }
  }

  /** Point transform src → dst (identity short-circuit when equal). */
  def transform(src: String, dst: String): (Double, Double) => (Double, Double) =
    if (src == dst) (x, y) => (x, y)
    else {
      val s = of(src); val d = of(dst)
      (x, y) => { val (lon, lat) = s.inverse(x, y); d.forward(lon, lat) }
    }

  /** Bounding box of `e` seen in `dst`: min/max over a DENSIFIED boundary
    * (n samples per edge) — projected edges curve, so corners alone
    * under-cover (the standard `gdal.Warp` bbox densification idea). */
  def projectExtent(e: Extent, src: String, dst: String, n: Int = 21): Extent = {
    if (src == dst) return e
    val t = transform(src, dst)
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
  def resIn(g: GridSpec, dst: String): Double = {
    if (g.crs == dst) return g.res
    val t = transform(g.crs, dst)
    val (cx, cy) = g.pixelToMap(g.w / 2, g.h / 2)
    val (x0, y0) = t(cx, cy)
    val (x1, y1) = t(cx + g.res, cy)
    math.hypot(x1 - x0, y1 - y0)
  }
}

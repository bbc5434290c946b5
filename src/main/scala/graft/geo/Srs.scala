package graft.geo

/** CRS identifiers + deterministic coordinate scalar math (no PROJ/GDAL).
  *
  * The engine standardizes on string CRS ids (`"EPSG:4326"`, `"EPSG:326XX"`,
  * …) and hierarchical cell ids as the spatial join key; invertible
  * projections for the registered CRS family (cross-CRS warps) live in
  * [[graft.geo.Proj]] — full general-purpose PROJ parity remains out of
  * scope. What IS reproduced exactly here: lon wrapping
  * (`geolib.py:216-239`), DMS conversion
  * (`geolib.py:242-291`), UTM zone selection with the Norway/Svalbard special
  * cases (`geolib.py:1917-1944`), ECEF (`geolib.py:107-111` semantics), and
  * the polar-stereographic area scale factor (`geolib.py:168-214`).
  */
object Srs {
  val Wgs84 = "EPSG:4326"

  def isGeographic(crs: String): Boolean = crs match {
    case "EPSG:4326" | "EPSG:4979" | "EPSG:4258" => true
    case _ => false
  }

  /** `wraplon`: lon → [0, 360) — `geolib.py:216-218`. */
  def wrapLon(lon: Double): Double = {
    val m = lon % 360.0
    if (m < 0) m + 360.0 else m   // Python % is floored-mod
  }

  /** lon (0,360) → (-180,180] — `lon360to180` `geolib.py:220-230` (the
    * canonical formula in its comment, also used in getUTMzone line 1925). */
  def lon360to180(lon: Double): Double = {
    val l = if (lon > 360.0 || lon < 0.0) wrapLon(lon) else lon
    (l + 180.0) - math.floor((l + 180.0) / 360.0) * 360.0 - 180.0
  }

  /** lon (-180,180) → [0,360) — `lon180to360` `geolib.py:232-239`. */
  def lon180to360(lon: Double): Double = (lon + 360.0) % 360.0

  /** Decimal degrees → (d, m, s) — `dd2dms` `geolib.py:243-252`. */
  def dd2dms(dd: Double): (Double, Double, Double) = {
    val neg = dd < 0
    val a = math.abs(dd)
    val totalSec = a * 3600.0
    val m0 = math.floor(totalSec / 60.0)
    val s = totalSec - m0 * 60.0
    val d = math.floor(m0 / 60.0)
    val m = m0 - d * 60.0
    (if (neg) -d else d, m, s)
  }

  /** Decimal degrees → degrees + decimal minutes — `dd2dm`
    * `geolib.py:286-291`. Faithful to the reference, including its
    * `m + s/3600` form (sic — the reference divides seconds by 3600, not
    * 60) and its `(d, m, s)` return shape with the original seconds. */
  def dd2dm(dd: Double): (Double, Double, Double) = {
    val (d, m, s) = dd2dms(dd)
    (d, m + s / 3600.0, s)
  }

  /** (d, m, s) → decimal degrees — `dms2dd` `geolib.py:254-262`. */
  def dms2dd(d: Double, m: Double, s: Double): Double = {
    val sign = if (d < 0) -1.0 else 1.0
    sign * (math.abs(d).toInt + m / 60.0 + s / 3600.0)
  }

  /** "D M S" string → decimal degrees — `dms2dd_str` `geolib.py:264-279`:
    * sign from any s/S/w/W in the string (applied to the degree term, as
    * the reference does), consecutive delimiters collapsed. */
  def dms2ddStr(dms: String, delim: String = " "): Double = {
    val sign = if (dms.exists(c => "swSW".indexOf(c) >= 0)) -1 else 1
    val parts = dms.split(java.util.regex.Pattern.quote(delim))
      .filter(_.nonEmpty).map(_.filter(c => c.isDigit || c == '.' || c == '-'))
    dms2dd(parts(0).toDouble.toInt * sign, parts(1).toDouble.toInt, parts(2).toDouble)
  }

  /** (degrees, decimal minutes) → decimal degrees — `dm2dd` `geolib.py:280-284`. */
  def dm2dd(d: Double, m: Double): Double = dms2dd(d, m, 0.0)

  /** UTM zone number+hemisphere for a lon/lat point — `getUTMzone`
    * `geolib.py:1917-1944` including Norway (32V) and Svalbard exceptions. */
  def utmZone(lon: Double, lat: Double): (Int, Char) = {
    val lon180 = (lon + 180.0) - math.floor((lon + 180.0) / 360.0) * 360.0 - 180.0
    var zone = (math.floor((lon180 + 180.0) / 6.0) + 1).toInt
    val hem = if (lat >= 0) 'N' else 'S'
    if (lat >= 56.0 && lat < 64.0 && lon180 >= 3.0 && lon180 < 12.0) zone = 32
    if (lat >= 72.0 && lat < 84.0) {
      if (lon180 >= 0.0 && lon180 < 9.0) zone = 31
      else if (lon180 >= 9.0 && lon180 < 21.0) zone = 33
      else if (lon180 >= 21.0 && lon180 < 33.0) zone = 35
      else if (lon180 >= 33.0 && lon180 < 42.0) zone = 37
    }
    (zone, hem)
  }

  /** UTM EPSG code: 326xx north / 327xx south — `getUTMepsg` `geolib.py:1946-1953`. */
  def utmEpsg(lon: Double, lat: Double): Int = {
    val (zone, hem) = utmZone(lon, lat)
    (if (hem == 'N') 32600 else 32700) + zone
  }

  // --- WGS84 ellipsoid + ECEF (ll2ecef/ecef2ll geolib.py:107-111 semantics) ---
  private val A  = 6378137.0              // semi-major axis
  private val F  = 1.0 / 298.257223563
  private val E2 = F * (2 - F)            // first eccentricity squared

  def ll2ecef(lon: Double, lat: Double, alt: Double): (Double, Double, Double) = {
    val lr = math.toRadians(lat); val br = math.toRadians(lon)
    val n = A / math.sqrt(1 - E2 * math.sin(lr) * math.sin(lr))
    ((n + alt) * math.cos(lr) * math.cos(br),
     (n + alt) * math.cos(lr) * math.sin(br),
     (n * (1 - E2) + alt) * math.sin(lr))
  }

  /** Polar stereographic AREA scale factor `1/k²` exactly as `scale_ps`
    * `geolib.py:168-214` (Snyder k = (mc/m)(t/tc); m70/t70 precomputed;
    * pole clamped to ±89.999999999; e2 pinned to the reference's constant). */
  def scalePs(lat0: Double): Double = {
    val north = lat0 > 0
    val m70t70 = if (north) 1.9332279 else 1.93903005
    val latClamped =
      if (north && lat0 >= 90.0) 89.999999999
      else if (!north && lat0 <= -90.0) -89.999999999
      else lat0
    val e2 = 0.006694379990141   // geolib.py:201 (BS-calculated WGS84)
    val e = math.sqrt(e2)
    val lat = math.abs(math.toRadians(latClamped))
    val slat = math.sin(lat); val clat = math.cos(lat)
    val m = clat / math.sqrt(1.0 - e2 * slat * slat)
    val t = math.tan(math.Pi / 4 - lat / 2) /
      math.pow((1.0 - e * slat) / (1.0 + e * slat), e / 2)
    val k = m70t70 * t / m
    1.0 / (k * k)
  }

  // --- Local projection factory — `localortho`/`localtmerc`
  // (`geolib.py:117-150`): a metric plane centered on (lon0, lat0) for
  // width/height/area calculations. Spherical forward formulas on the WGS84
  // mean sphere (Snyder's standard forms); for the local extents these serve
  // (the reference uses them only for cartesian distance/area on a single
  // geometry) the spherical-vs-ellipsoidal error is <0.1 %, documented here
  // rather than pulling in a PROJ dependency. ---
  private val Rm = 6371008.8 // mean sphere radius, same as haversineM

  /** Local orthographic forward: (lon, lat) → meters on the tangent plane
    * at (lon0, lat0) — `localortho` `geolib.py:130-138`. */
  def localOrtho(lon0: Double, lat0: Double)(lon: Double, lat: Double): (Double, Double) = {
    val l0 = math.toRadians(lat0); val dl = math.toRadians(lon - lon0)
    val lr = math.toRadians(lat)
    val x = Rm * math.cos(lr) * math.sin(dl)
    val y = Rm * (math.cos(l0) * math.sin(lr) - math.sin(l0) * math.cos(lr) * math.cos(dl))
    (x, y)
  }

  /** Local transverse-Mercator forward (spherical, k0 = 1) —
    * `localtmerc` `geolib.py:122-127`. */
  def localTmerc(lon0: Double, lat0: Double)(lon: Double, lat: Double): (Double, Double) = {
    val dl = math.toRadians(lon - lon0); val lr = math.toRadians(lat)
    val b = math.cos(lr) * math.sin(dl)
    val x = Rm * 0.5 * math.log((1 + b) / (1 - b)) // atanh(B)
    val y = Rm * (math.atan2(math.tan(lr), math.cos(dl)) - math.toRadians(lat0))
    (x, y)
  }

  /** Haversine great-circle distance in meters on the WGS84 mean sphere —
    * deterministic distance for the kNN refine (north rule). */
  def haversineM(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val R = 6371008.8
    val p1 = math.toRadians(lat1); val p2 = math.toRadians(lat2)
    val dp = p2 - p1; val dl = math.toRadians(lon2 - lon1)
    val a = math.sin(dp / 2) * math.sin(dp / 2) +
      math.cos(p1) * math.cos(p2) * math.sin(dl / 2) * math.sin(dl / 2)
    2 * R * math.asin(math.min(1.0, math.sqrt(a)))
  }
}

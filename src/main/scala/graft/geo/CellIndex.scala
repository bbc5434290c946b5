package graft.geo

/** Hierarchical spatial cell indexes — the engine's join keys (north rule:
  * images assigned to H3-style and S2-style cells; covering-cell prefilter
  * for point-in-polygon; k-ring expansion for kNN).
  *
  * All codecs are pure arithmetic on `Long` ids: deterministic, branch-light,
  * safe inside Catalyst expressions, and stable across parallelism levels.
  * The reference has no cell index (it joins positionally after grid
  * alignment); these are the scale substitute for "align then index by pixel".
  */
object ZCell {
  /** Z-order (Morton) quadtree on the equirectangular plane.
    * Resolution r ∈ [0, 26]: a 2^r × 2^r grid over lon ∈ [-180, 180),
    * lat ∈ [-90, 90]. Id layout: [res: 5 bits | morton(ix, iy): 2r bits].
    * Aperture 4: child cells tile the parent exactly (unlike hex). */
  val MaxRes = 26

  @inline private def part1by1(x0: Long): Long = {
    var x = x0 & 0x3ffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8))  & 0x00ff00ff00ff00ffL
    x = (x | (x << 4))  & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }
  @inline private def compact1by1(x0: Long): Long = {
    var x = x0 & 0x5555555555555555L
    x = (x | (x >> 1))  & 0x3333333333333333L
    x = (x | (x >> 2))  & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x >> 4))  & 0x00ff00ff00ff00ffL
    x = (x | (x >> 8))  & 0x0000ffff0000ffffL
    x = (x | (x >> 16)) & 0x0000000003ffffffL
    x
  }

  @inline def n(res: Int): Long = 1L << res

  /** Integer grid coords of a lon/lat at res (lon wrapped, lat clamped). */
  def xy(lon: Double, lat: Double, res: Int): (Long, Long) = {
    val nn = n(res)
    val lw = Srs.lon360to180(Srs.wrapLon(lon))
    var ix = math.floor((lw + 180.0) / 360.0 * nn).toLong
    var iy = math.floor((90.0 - lat) / 180.0 * nn).toLong
    if (ix >= nn) ix = nn - 1; if (ix < 0) ix = 0
    if (iy >= nn) iy = nn - 1; if (iy < 0) iy = 0
    (ix, iy)
  }

  def pack(ix: Long, iy: Long, res: Int): Long =
    (res.toLong << 56) | (part1by1(ix) | (part1by1(iy) << 1))

  def encode(lon: Double, lat: Double, res: Int): Long = {
    require(res >= 0 && res <= MaxRes, s"res out of range: $res")
    val (ix, iy) = xy(lon, lat, res)
    pack(ix, iy, res)
  }

  def res(cell: Long): Int = ((cell >>> 56) & 0x3f).toInt
  def ix(cell: Long): Long = compact1by1(cell)
  def iy(cell: Long): Long = compact1by1(cell >> 1)

  def parent(cell: Long): Long = {
    val r = res(cell); require(r > 0)
    pack(ix(cell) >> 1, iy(cell) >> 1, r - 1)
  }

  def children(cell: Long): Seq[Long] = {
    val r = res(cell); require(r < MaxRes)
    val x0 = ix(cell) << 1; val y0 = iy(cell) << 1
    for (dy <- 0 to 1; dx <- 0 to 1) yield pack(x0 + dx, y0 + dy, r + 1)
  }

  /** Cell footprint in lon/lat. */
  def extent(cell: Long): Extent = {
    val r = res(cell); val nn = n(r).toDouble
    val x = ix(cell).toDouble; val y = iy(cell).toDouble
    Extent(-180.0 + x / nn * 360.0, 90.0 - (y + 1) / nn * 180.0,
           -180.0 + (x + 1) / nn * 360.0, 90.0 - y / nn * 180.0)
  }

  def center(cell: Long): (Double, Double) = {
    val e = extent(cell)
    ((e.xmin + e.xmax) / 2, (e.ymin + e.ymax) / 2)
  }

  /** Ring k around a cell (k=0 → the cell itself). Longitude wraps; latitude
    * rows outside the grid are dropped (pole truncation). Returned sorted for
    * determinism. */
  def ring(cell: Long, k: Int): Seq[Long] = {
    val r = res(cell); val nn = n(r)
    val cx = ix(cell); val cy = iy(cell)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var dy = -k
    while (dy <= k) {
      val y = cy + dy
      if (y >= 0 && y < nn) {
        var dx = -k
        while (dx <= k) {
          if (math.max(math.abs(dx), math.abs(dy)) == k) {
            val x = ((cx + dx) % nn + nn) % nn
            out += pack(x, y, r)
          }
          dx += 1
        }
      }
      dy += 1
    }
    out.distinct.sorted.toSeq
  }

  /** Disk of radius k: union of rings 0..k — the kNN expansion unit. */
  def kRing(cell: Long, k: Int): Seq[Long] =
    (0 to k).flatMap(ring(cell, _)).distinct.sorted

  /** All cells at `res` whose footprint intersects `e` (the covering-cell
    * prefilter for polygons — analog of OGR SetSpatialFilter geolib.py:663). */
  def cover(e: Extent, res: Int): Seq[Long] = {
    val nn = n(res)
    val (x0, y1) = xy(e.xmin, e.ymin, res)   // y1 = bottom row
    val (x1, y0) = xy(e.xmax, e.ymax, res)
    // handle anti-meridian-free case only (engine keeps extents in [-180,180])
    val xs = math.min(x0, x1) to math.max(x0, x1)
    val ys = math.min(y0, y1) to math.max(y0, y1)
    require(xs.length.toLong * ys.length <= 4_000_000L, // Long: Int product can overflow past the guard
      s"cover() would enumerate ${xs.length.toLong * ys.length} cells; lower res")
    (for (y <- ys; x <- xs) yield pack(x, y, res)).sorted
  }
}

/** Planar integer cell grid for projected CRS (meters): cell = floor(x/size),
  * floor(y/size) packed with a 2^31 offset. The covering/prefilter index for
  * UTM-space tiling and PIP joins (extents stay well under the offset). */
object PlanarCell {
  private val OFF = 1L << 30

  def encode(x: Double, y: Double, size: Double): Long = {
    val cx = math.floor(x / size).toLong + OFF
    val cy = math.floor(y / size).toLong + OFF
    (cx << 31) | cy
  }
  def cx(cell: Long): Long = (cell >>> 31) - OFF
  def cy(cell: Long): Long = (cell & 0x7fffffffL) - OFF
  def pack(cxv: Long, cyv: Long): Long = ((cxv + OFF) << 31) | (cyv + OFF)

  def extent(cell: Long, size: Double): Extent =
    Extent(cx(cell) * size, cy(cell) * size, (cx(cell) + 1) * size, (cy(cell) + 1) * size)

  /** All cells intersecting `e` (half-open cell footprints). */
  def cover(e: Extent, size: Double): Seq[Long] = {
    val x0 = math.floor(e.xmin / size).toLong
    val x1 = math.floor(e.xmax / size).toLong
    val y0 = math.floor(e.ymin / size).toLong
    val y1 = math.floor(e.ymax / size).toLong
    require((x1 - x0 + 1) * (y1 - y0 + 1) <= 4_000_000,
      "cover() too large; raise cell size")
    for (y <- y0 to y1; x <- x0 to x1) yield pack(x, y)
  }

  def ring(cell: Long, k: Int): Seq[Long] = {
    if (k == 0) return Seq(cell)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (dy <- -k to k; dx <- -k to k
         if math.max(math.abs(dx), math.abs(dy)) == k)
      out += pack(cx(cell) + dx, cy(cell) + dy)
    out.sorted.toSeq
  }

  def kRing(cell: Long, k: Int): Seq[Long] = (0 to k).flatMap(ring(cell, _)).distinct.sorted
}

/** H3-style hexagonal index: pointy-top hex grid in equirectangular space
  * with cube-coordinate arithmetic (public hex-grid math, cf. the H3 paper's
  * axial/cube coordinate treatment). Aperture ~4 between resolutions (edge
  * halves each res). Like real H3, parents only *approximately* contain
  * children (hex hierarchies never nest exactly); `parent` re-encodes the
  * child center at the coarser res.
  * Id layout: [1 sign-safe 0 | res: 6 bits | q+OFF: 28 bits | r+OFF: 28 bits]. */
object HexCell {
  val MaxRes = 15
  private val OFF = 1L << 27
  /** Edge length in degrees at res 0; halves per res (aperture-4 family). */
  val Edge0 = 12.0

  def edge(res: Int): Double = Edge0 / (1L << res)

  /** lon/lat → fractional axial coords (pointy-top; size = edge). */
  private def toAxial(lon: Double, lat: Double, res: Int): (Double, Double) = {
    val s = edge(res)
    val x = Srs.lon360to180(Srs.wrapLon(lon)); val y = lat
    val q = (math.sqrt(3.0) / 3.0 * x - 1.0 / 3.0 * y) / s
    val r = (2.0 / 3.0 * y) / s
    (q, r)
  }

  /** Cube rounding (standard published hex-grid algorithm). */
  def roundAxial(qf: Double, rf: Double): (Long, Long) = {
    val xf = qf; val zf = rf; val yf = -xf - zf
    var rx = math.round(xf); var ry = math.round(yf); var rz = math.round(zf)
    val dx = math.abs(rx - xf); val dy = math.abs(ry - yf); val dz = math.abs(rz - zf)
    if (dx > dy && dx > dz) rx = -ry - rz
    else if (dy > dz) ry = -rx - rz
    else rz = -rx - ry
    (rx, rz)
  }

  def pack(q: Long, r: Long, res: Int): Long =
    (res.toLong << 56) | ((q + OFF) << 28) | (r + OFF)

  def encode(lon: Double, lat: Double, res: Int): Long = {
    require(res >= 0 && res <= MaxRes)
    val (qf, rf) = toAxial(lon, lat, res)
    val (q, r) = roundAxial(qf, rf)
    pack(q, r, res)
  }

  def res(cell: Long): Int = ((cell >>> 56) & 0x3f).toInt
  def q(cell: Long): Long = ((cell >> 28) & 0xfffffffL) - OFF
  def r(cell: Long): Long = (cell & 0xfffffffL) - OFF

  def center(cell: Long): (Double, Double) = {
    val s = edge(res(cell))
    val qq = q(cell).toDouble; val rr = r(cell).toDouble
    val x = s * (math.sqrt(3.0) * qq + math.sqrt(3.0) / 2.0 * rr)
    val y = s * (3.0 / 2.0 * rr)
    (x, y)
  }

  def parent(cell: Long): Long = {
    val (lon, lat) = center(cell)
    encode(lon, lat, res(cell) - 1)
  }

  private val Dirs = Seq((1L, 0L), (1L, -1L), (0L, -1L), (-1L, 0L), (-1L, 1L), (0L, 1L))

  def neighbors(cell: Long): Seq[Long] =
    Dirs.map { case (dq, dr) => pack(q(cell) + dq, r(cell) + dr, res(cell)) }

  /** Hex ring k (standard cube-coordinate ring walk); k=0 → the cell. */
  def ring(cell: Long, k: Int): Seq[Long] = {
    if (k == 0) return Seq(cell)
    val rs = res(cell)
    var cq = q(cell) + Dirs(4)._1 * k
    var cr = r(cell) + Dirs(4)._2 * k
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (i <- 0 until 6; _ <- 0 until k) {
      out += pack(cq, cr, rs)
      cq += Dirs(i)._1; cr += Dirs(i)._2
    }
    out.sorted.toSeq
  }

  def kRing(cell: Long, k: Int): Seq[Long] =
    (0 to k).flatMap(ring(cell, _)).distinct.sorted
}

/** S2-style cell id: cube-face projection with the published S2 quadratic
  * ST transform, Morton position within face. Levels 0..28.
  * Id layout: [face: 3 bits | level: 5 bits | morton(i, j): 2·level bits]. */
object S2Lite {
  val MaxLevel = 26

  /** lon/lat → unit (x,y,z). */
  private def toXyz(lon: Double, lat: Double): (Double, Double, Double) = {
    val phi = math.toRadians(lat); val theta = math.toRadians(lon)
    (math.cos(phi) * math.cos(theta), math.cos(phi) * math.sin(theta), math.sin(phi))
  }

  /** Face + (u, v) in [-1,1]² (standard S2 face layout). */
  def faceUv(lon: Double, lat: Double): (Int, Double, Double) = {
    val (x, y, z) = toXyz(lon, lat)
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    if (ax >= ay && ax >= az) {
      if (x > 0) (0, y / x, z / x) else (3, -z / x, -y / x)
    } else if (ay >= az) {
      if (y > 0) (1, -x / y, z / y) else (4, -z / y, x / y)
    } else {
      if (z > 0) (2, -x / z, -y / z) else (5, y / z, -x / z)
    }
  }

  /** S2 quadratic u→s transform (public: s2coords.h semantics). */
  def uvToSt(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1 + 3 * u) else 1 - 0.5 * math.sqrt(1 - 3 * u)
  def stToUv(s: Double): Double =
    if (s >= 0.5) (1.0 / 3.0) * (4 * s * s - 1) else (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s))

  @inline private def mort(ix: Long, iy: Long): Long = {
    var m = 0L; var b = 0
    while (b < MaxLevel) {
      m |= ((ix >> b) & 1L) << (2 * b)
      m |= ((iy >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    m
  }

  def encode(lon: Double, lat: Double, level: Int): Long = {
    require(level >= 0 && level <= MaxLevel)
    val (face, u, v) = faceUv(lon, lat)
    val nn = 1L << level
    var i = math.floor(uvToSt(u) * nn).toLong
    var j = math.floor(uvToSt(v) * nn).toLong
    if (i >= nn) i = nn - 1; if (i < 0) i = 0
    if (j >= nn) j = nn - 1; if (j < 0) j = 0
    (face.toLong << 58) | (level.toLong << 52) | mort(i, j)
  }

  def face(cell: Long): Int = ((cell >>> 58) & 0x7).toInt
  def level(cell: Long): Int = ((cell >>> 52) & 0x3f).toInt

  @inline private def unmort(m: Long, sel: Int): Long = {
    var x = 0L; var b = 0
    while (b < MaxLevel) { x |= ((m >> (2 * b + sel)) & 1L) << b; b += 1 }
    x
  }
  def i(cell: Long): Long = unmort(cell & ((1L << 52) - 1), 0)
  def j(cell: Long): Long = unmort(cell & ((1L << 52) - 1), 1)

  def parent(cell: Long): Long = {
    val l = level(cell); require(l > 0)
    (face(cell).toLong << 58) | ((l - 1).toLong << 52) | mort(i(cell) >> 1, j(cell) >> 1)
  }

  /** Cell center back to lon/lat (face → unit vector → spherical). */
  def center(cell: Long): (Double, Double) = {
    val l = level(cell); val nn = (1L << l).toDouble
    val u = stToUv((i(cell) + 0.5) / nn)
    val v = stToUv((j(cell) + 0.5) / nn)
    val (x, y, z) = face(cell) match {
      case 0 => (1.0, u, v)
      case 1 => (-u, 1.0, v)
      case 2 => (-u, -v, 1.0)
      case 3 => (-1.0, v, u)
      case 4 => (-v, -1.0, u)
      case 5 => (v, -u, -1.0)
    }
    val r = math.sqrt(x * x + y * y + z * z)
    (math.toDegrees(math.atan2(y, x)), math.toDegrees(math.asin(z / r)))
  }
}

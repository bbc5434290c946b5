package graft.geo

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal planar vector geometry: polygons (with holes) and multipolygons,
  * WKB-encoded on the wire (public OGC WKB spec), with an even-odd
  * ray-crossing point-in-polygon test matching the reference's rasterize /
  * PIL scanline-fill semantics (`geolib.py:685`, `geom2mask_PIL`
  * `geolib.py:1532-1561`: a pixel is inside if its center is inside by the
  * even-odd rule).
  */
final case class Ring(xs: Array[Double], ys: Array[Double]) {
  def n: Int = xs.length
}

final case class Polygon(shell: Ring, holes: Seq[Ring]) {
  lazy val bbox: Extent = {
    var x0 = Double.MaxValue; var y0 = Double.MaxValue
    var x1 = Double.MinValue; var y1 = Double.MinValue
    var i = 0
    while (i < shell.n) {
      val x = shell.xs(i); val y = shell.ys(i)
      if (x < x0) x0 = x; if (x > x1) x1 = x
      if (y < y0) y0 = y; if (y > y1) y1 = y
      i += 1
    }
    Extent(x0, y0, x1, y1)
  }

  /** Even-odd ray-crossing PIP. Boundary handling follows the classic
    * crossing-number algorithm (half-open edges), deterministic for points
    * not exactly on an edge. */
  def contains(px: Double, py: Double): Boolean = {
    if (!bbox.containsPoint(px, py)) return false
    var inside = Polygon.ringContains(shell, px, py)
    if (inside) {
      var h = 0
      while (h < holes.length && inside) {
        if (Polygon.ringContains(holes(h), px, py)) inside = false
        h += 1
      }
    }
    inside
  }
}

object Polygon {
  def ringContains(r: Ring, px: Double, py: Double): Boolean = {
    var inside = false
    var i = 0
    var j = r.n - 1
    while (i < r.n) {
      val xi = r.xs(i); val yi = r.ys(i)
      val xj = r.xs(j); val yj = r.ys(j)
      if (((yi > py) != (yj > py)) &&
          (px < (xj - xi) * (py - yi) / (yj - yi) + xi)) inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** Convenience: axis-aligned box polygon (bbox2geom `geolib.py:2026-2043`). */
  def box(e: Extent): Polygon = Polygon(
    Ring(Array(e.xmin, e.xmax, e.xmax, e.xmin, e.xmin),
         Array(e.ymin, e.ymin, e.ymax, e.ymax, e.ymin)), Nil)
}

final case class MultiPolygon(polys: Seq[Polygon]) {
  lazy val bbox: Extent = Extent.unionAll(polys.map(_.bbox))
  def contains(px: Double, py: Double): Boolean = polys.exists(_.contains(px, py))

  /** Covering cells at `res`: cells whose footprint intersects the bbox,
    * refined so a cell is kept only if it could contain interior points
    * (bbox-level prefilter; exact PIP runs at join refine). */
  def coveringCells(res: Int): Seq[Long] =
    polys.flatMap(p => ZCell.cover(p.bbox, res)).distinct.sorted
}

/** Geometry algebra the reference reaches through OGR: signed/total area,
  * centroid, Douglas-Peucker simplify (`geom.Simplify`, `geolib.py:884-889`),
  * convex hull (`geom.ConvexHull`, `geolib.py:890-891`), and the
  * local-orthographic metric transform (`geom2localortho`
  * `geolib.py:140-150`) for true cartesian width/height/area. */
object Geom {
  /** Shoelace area of one ring (absolute). */
  def ringArea(r: Ring): Double = {
    var s = 0.0
    var i = 0
    var j = r.n - 1
    while (i < r.n) {
      s += (r.xs(j) + r.xs(i)) * (r.ys(j) - r.ys(i))
      j = i; i += 1
    }
    math.abs(s) / 2.0
  }

  /** Polygon area, holes subtracted; multipolygon = sum of parts. */
  def area(p: Polygon): Double = ringArea(p.shell) - p.holes.map(ringArea).sum
  def area(mp: MultiPolygon): Double = mp.polys.map(area).sum

  /** Area-weighted centroid of a multipolygon's shells (degenerate →
    * vertex mean). */
  def centroid(mp: MultiPolygon): (Double, Double) = {
    var cx = 0.0; var cy = 0.0; var aSum = 0.0
    mp.polys.foreach { p =>
      val r = p.shell
      var i = 0
      var j = r.n - 1
      while (i < r.n) {
        val cross = r.xs(j) * r.ys(i) - r.xs(i) * r.ys(j)
        cx += (r.xs(j) + r.xs(i)) * cross
        cy += (r.ys(j) + r.ys(i)) * cross
        aSum += cross
        j = i; i += 1
      }
    }
    if (math.abs(aSum) < 1e-12) {
      val all = mp.polys.flatMap(p => p.shell.xs.zip(p.shell.ys))
      (all.map(_._1).sum / all.length, all.map(_._2).sum / all.length)
    } else (cx / (3 * aSum), cy / (3 * aSum))
  }

  /** Douglas-Peucker polyline simplification with tolerance `tol` (the
    * `geom.Simplify(tol)` analog; the reference uses tol = 2 px for
    * outlines, `geolib.py:887-889`). Ring endpoints stay anchored. */
  def simplifyRing(r: Ring, tol: Double): Ring = {
    if (r.n <= 4) return r
    val keep = new Array[Boolean](r.n)
    keep(0) = true; keep(r.n - 1) = true
    def dp(i0: Int, i1: Int): Unit = {
      if (i1 <= i0 + 1) return
      val x0 = r.xs(i0); val y0 = r.ys(i0)
      val dx = r.xs(i1) - x0; val dy = r.ys(i1) - y0
      val len = math.sqrt(dx * dx + dy * dy)
      var worst = -1.0; var wi = -1
      var i = i0 + 1
      while (i < i1) {
        val d =
          if (len < 1e-300) math.hypot(r.xs(i) - x0, r.ys(i) - y0)
          else math.abs(dy * (r.xs(i) - x0) - dx * (r.ys(i) - y0)) / len
        if (d > worst) { worst = d; wi = i }
        i += 1
      }
      if (worst > tol) { keep(wi) = true; dp(i0, wi); dp(wi, i1) }
    }
    dp(0, r.n - 1)
    val idx = (0 until r.n).filter(keep)
    if (idx.length < 4) r
    else Ring(idx.map(r.xs).toArray, idx.map(r.ys).toArray)
  }

  def simplify(mp: MultiPolygon, tol: Double): MultiPolygon =
    MultiPolygon(mp.polys.map(p =>
      Polygon(simplifyRing(p.shell, tol), p.holes.map(simplifyRing(_, tol)))))

  /** Convex hull of all vertices (Andrew monotone chain), closed CCW ring —
    * the `geom.ConvexHull()` analog. */
  def convexHull(mp: MultiPolygon): Polygon = {
    val pts = mp.polys.flatMap(p => p.shell.xs.zip(p.shell.ys))
      .distinct.sortBy(p => (p._1, p._2))
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)) =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    if (pts.length < 3) {
      val xs = pts.map(_._1); val ys = pts.map(_._2)
      return Polygon(Ring((xs :+ xs.head).toArray, (ys :+ ys.head).toArray), Nil)
    }
    var lower = List.empty[(Double, Double)]
    pts.foreach { p =>
      while (lower.length >= 2 && cross(lower.tail.head, lower.head, p) <= 0)
        lower = lower.tail
      lower = p :: lower
    }
    var upper = List.empty[(Double, Double)]
    pts.reverse.foreach { p =>
      while (upper.length >= 2 && cross(upper.tail.head, upper.head, p) <= 0)
        upper = upper.tail
      upper = p :: upper
    }
    val hull = (lower.reverse.dropRight(1) ++ upper.reverse.dropRight(1)) :+ lower.last
    Polygon(Ring(hull.map(_._1).toArray, hull.map(_._2).toArray), Nil)
  }

  /** `geom2localortho` `geolib.py:140-150`: re-express the geometry in a
    * local orthographic meters plane centered on its centroid (input coords
    * must be lon/lat). Returns the transformed geometry; pair with `area`
    * for the reference's metric area workflow. */
  def toLocalOrtho(mp: MultiPolygon): MultiPolygon = {
    val (lon0, lat0) = centroid(mp)
    val f = Srs.localOrtho(lon0, lat0) _
    def tx(r: Ring): Ring = {
      val xs = new Array[Double](r.n); val ys = new Array[Double](r.n)
      var i = 0
      while (i < r.n) {
        val (x, y) = f(r.xs(i), r.ys(i)); xs(i) = x; ys(i) = y; i += 1
      }
      Ring(xs, ys)
    }
    MultiPolygon(mp.polys.map(p => Polygon(tx(p.shell), p.holes.map(tx))))
  }

  /** Metric (m²) area of a lon/lat geometry via the local-ortho transform. */
  def metricArea(mp: MultiPolygon): Double = area(toLocalOrtho(mp))
}

/** OGC WKB reader/writer for Polygon (3) and MultiPolygon (6), 2-D,
  * little-endian on write, either endianness on read. */
object Wkb {
  def writePolygon(p: Polygon): Array[Byte] = {
    val rings = p.shell +: p.holes
    val size = 1 + 4 + 4 + rings.map(r => 4 + 16 * r.n).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte); bb.putInt(3); bb.putInt(rings.length)
    rings.foreach { r =>
      bb.putInt(r.n)
      var i = 0
      while (i < r.n) { bb.putDouble(r.xs(i)); bb.putDouble(r.ys(i)); i += 1 }
    }
    bb.array()
  }

  def writeMultiPolygon(mp: MultiPolygon): Array[Byte] = {
    val parts = mp.polys.map(writePolygon)
    val bb = ByteBuffer.allocate(1 + 4 + 4 + parts.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte); bb.putInt(6); bb.putInt(parts.length)
    parts.foreach(bb.put)
    bb.array()
  }

  def read(bytes: Array[Byte]): MultiPolygon = {
    val bb = ByteBuffer.wrap(bytes)
    readGeom(bb)
  }

  private def order(bb: ByteBuffer): Unit = {
    val bo = bb.get()
    bb.order(if (bo == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
  }

  private def readGeom(bb: ByteBuffer): MultiPolygon = {
    order(bb)
    bb.getInt() match {
      case 3 => MultiPolygon(Seq(readPolygonBody(bb)))
      case 6 =>
        val n = bb.getInt()
        MultiPolygon((0 until n).map { _ => order(bb); require(bb.getInt() == 3); readPolygonBody(bb) })
      case t => throw new IllegalArgumentException(s"unsupported WKB type $t")
    }
  }

  private def readPolygonBody(bb: ByteBuffer): Polygon = {
    val nRings = bb.getInt()
    val rings = (0 until nRings).map { _ =>
      val n = bb.getInt()
      val xs = new Array[Double](n); val ys = new Array[Double](n)
      var i = 0
      while (i < n) { xs(i) = bb.getDouble(); ys(i) = bb.getDouble(); i += 1 }
      Ring(xs, ys)
    }
    Polygon(rings.head, rings.tail)
  }
}

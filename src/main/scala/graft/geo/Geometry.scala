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

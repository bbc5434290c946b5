package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class GeomSpec extends AnyFunSuite {
  def square(x0: Double, y0: Double, s: Double): Polygon = Polygon(
    Ring(Array(x0, x0 + s, x0 + s, x0, x0),
         Array(y0, y0, y0 + s, y0 + s, y0)), Nil)

  test("area: square, square-with-hole, multipolygon sum") {
    assert(math.abs(Geom.area(square(0, 0, 2)) - 4.0) < 1e-12)
    val holed = Polygon(square(0, 0, 4).shell, Seq(square(1, 1, 1).shell))
    assert(math.abs(Geom.area(holed) - 15.0) < 1e-12)
    val mp = MultiPolygon(Seq(square(0, 0, 1), square(10, 10, 3)))
    assert(math.abs(Geom.area(mp) - 10.0) < 1e-12)
  }

  test("centroid of a square is its center") {
    val (cx, cy) = Geom.centroid(MultiPolygon(Seq(square(2, 4, 6))))
    assert(math.abs(cx - 5.0) < 1e-9 && math.abs(cy - 7.0) < 1e-9)
  }

  test("simplify removes collinear chatter, keeps corners (geolib.py:884-889)") {
    // a square edge sampled every 0.1 with tiny jitter < tol
    val xs = (0 to 100).map(_ / 10.0) ++ Seq(10.0, 0.0, 0.0)
    val ys = (0 to 100).map(i => if (i % 2 == 0) 0.0 else 0.05) ++ Seq(10.0, 10.0, 0.0)
    val r = Ring(xs.toArray, ys.toArray)
    val simp = Geom.simplifyRing(r, 0.2)
    assert(simp.n < 10, s"still ${simp.n} points")
    // corners survive within the polygon outline (area approximately kept)
    val a0 = Geom.ringArea(r); val a1 = Geom.ringArea(simp)
    assert(math.abs(a0 - a1) / a0 < 0.02)
  }

  test("convex hull of an L-shape is the bounding pentagon (geolib.py:890-891)") {
    val l = Polygon(Ring(
      Array(0.0, 4, 4, 2, 2, 0, 0), Array(0.0, 0, 2, 2, 4, 4, 0)), Nil)
    val hull = Geom.convexHull(MultiPolygon(Seq(l)))
    // hull area = big square minus the notch triangle = 16 − 2 = 14
    assert(math.abs(Geom.ringArea(hull.shell) - 14.0) < 1e-9)
    // hull is convex: contains a notch point the L excludes
    assert(hull.contains(2.9, 2.9) && !l.contains(2.9, 2.9))
  }

  test("local ortho metric area matches haversine edge lengths (geolib.py:130-150)") {
    // ~0.01° square at lat 45: width = haversine along a parallel, height along meridian
    val lon0 = 7.0; val lat0 = 45.0; val d = 0.01
    val sq = Polygon(Ring(
      Array(lon0, lon0 + d, lon0 + d, lon0, lon0),
      Array(lat0, lat0, lat0 + d, lat0 + d, lat0)), Nil)
    val a = Geom.metricArea(MultiPolygon(Seq(sq)))
    val wBottom = Srs.haversineM(lon0, lat0, lon0 + d, lat0)
    val hSide = Srs.haversineM(lon0, lat0, lon0, lat0 + d)
    val approx = wBottom * hSide
    assert(math.abs(a - approx) / approx < 0.01, s"$a vs $approx")
    // localtmerc sanity: x at the center latitude ≈ east offset in meters
    val (tx, ty) = Srs.localTmerc(lon0, lat0)(lon0 + d, lat0)
    assert(math.abs(tx - wBottom) / wBottom < 0.01 && math.abs(ty) < 1.0)
  }
}

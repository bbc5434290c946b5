package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/** Golden-semantics tests for the geo core, expected values hand-computed
  * from the reference formulas (citations inline). */
class GeoCoreSpec extends AnyFunSuite {

  test("warp dims: nl=ns=round(10/3)=3 (warplib.py:120-121, banker's round)") {
    val g = GridSpec.fromExtentRes(Extent(0, 0, 10, 10), 3.0, "EPSG:32610")
    assert(g.w == 3 && g.h == 3)
    // banker's rounding cases: round(2.5)=2, round(3.5)=4 in Python 3
    val g2 = GridSpec.fromExtentRes(Extent(0, 0, 5, 7), 2.0, "x")
    assert(g2.w == 2 && g2.h == 4)   // 5/2=2.5→2, 7/2=3.5→4
  }

  test("gt from extent/res: [x0,res,0,y1,0,-res] (warplib.py:139)") {
    val g = GridSpec.fromExtentRes(Extent(100, 200, 160, 260), 10.0, "x")
    assert(g.ulx == 100.0 && g.uly == 260.0 && g.res == 10.0 && g.w == 6 && g.h == 6)
    assert(g.extent == Extent(100, 200, 160, 260))
  }

  test("pixelToMap adds 0.5 px: px(0,0) -> (ulx+0.5res, uly-0.5res) (geolib.py:311-323)") {
    val g = GridSpec(1000, 2000, 30, "x", 10, 10)
    assert(g.pixelToMap(0, 0) == (1015.0, 1985.0))
    // mapToPixel is the inverse with the -0.5 shift (geolib.py:293-309)
    val (px, py) = g.mapToPixel(1015.0, 1985.0)
    assert(math.abs(px) < 1e-12 && math.abs(py) < 1e-12)
  }

  test("mapToPixel . pixelToMap == id (property, geolib.py:293-323)") {
    val g = GridSpec(-50, 50, 0.25, "EPSG:4326", 100, 100)
    for (p <- Seq((0.0, 0.0), (3.25, 7.75), (99.0, 99.0))) {
      val (mx, my) = g.pixelToMap(p._1, p._2)
      val (px, py) = g.mapToPixel(mx, my)
      assert(math.abs(px - p._1) < 1e-9 && math.abs(py - p._2) < 1e-9)
    }
  }

  test("res strategies over {1,2,4}: min=1 max=4 mean=7/3 med=2 (warplib.py:341-352)") {
    val rs = Seq(1.0, 2.0, 4.0)
    assert(GridSpec.parseRes("min", rs) == 1.0)
    assert(GridSpec.parseRes("max", rs) == 4.0)
    assert(math.abs(GridSpec.parseRes("mean", rs) - 7.0 / 3.0) < 1e-12)
    assert(GridSpec.parseRes("med", rs) == 2.0)
  }

  test("common_scale_factor {1,4} = sqrt(4/1)*1 = 2 (warplib.py:353-355)") {
    assert(GridSpec.parseRes("common_scale_factor", Seq(1.0, 4.0)) == 2.0)
  }

  test("extent union/intersection; disjoint intersection errors (warplib.py:401-408)") {
    val a = Extent(0, 0, 10, 10); val b = Extent(5, 5, 20, 20)
    assert(GridSpec.parseExtent("union", Seq(a, b)) == Extent(0, 0, 20, 20))
    assert(GridSpec.parseExtent("intersection", Seq(a, b)) == Extent(5, 5, 10, 10))
    val c = Extent(100, 100, 110, 110)
    assertThrows[IllegalArgumentException](GridSpec.parseExtent("intersection", Seq(a, c)))
  }

  test("union extent contains every input extent (property)") {
    val es = Seq(Extent(0, 0, 1, 1), Extent(-5, 2, 0, 3), Extent(10, -10, 11, 0))
    val u = Extent.unionAll(es)
    es.foreach { e =>
      assert(u.xmin <= e.xmin && u.ymin <= e.ymin && u.xmax >= e.xmax && u.ymax >= e.ymax)
    }
  }

  test("extent round/compare at precision (geolib.py:1273-1287, 1435-1448)") {
    val e1 = Extent(0.0004, 0, 10.0004, 10)
    val e2 = Extent(0.0, 0, 10.0, 10)
    assert(e1.approxEquals(e2, 1e-3))
    assert(!e1.approxEquals(e2, 1e-4))
    assert(Extent.resCompare(30.0000001, 30.0, 1e-3))
  }

  test("pad extent by fixed width and percent (geolib.py:1339-1350)") {
    assert(Extent(0, 0, 10, 10).pad(1) == Extent(-1, -1, 11, 11))
    assert(Extent(0, 0, 10, 20).pad(0.1, perc = true) == Extent(-1, -2, 11, 22))
  }

  test("UTM zone: standard + Norway + Svalbard special cases (geolib.py:1917-1944)") {
    assert(Srs.utmZone(-122.3, 47.6) == (10, 'N'))     // Seattle
    assert(Srs.utmZone(0.1, -50.0) == (31, 'S'))
    assert(Srs.utmZone(5.0, 60.0) == (32, 'N'))        // Norway 32V exception
    assert(Srs.utmZone(8.0, 75.0) == (31, 'N'))        // Svalbard
    assert(Srs.utmZone(15.0, 78.0) == (33, 'N'))
    assert(Srs.utmZone(25.0, 78.0) == (35, 'N'))
    assert(Srs.utmZone(35.0, 78.0) == (37, 'N'))
    assert(Srs.utmEpsg(-122.3, 47.6) == 32610)
    assert(Srs.utmEpsg(0.1, -50.0) == 32731)
  }

  test("lon wrap (geolib.py:216-239)") {
    assert(Srs.wrapLon(-170.0) == 190.0)
    assert(Srs.lon360to180(190.0) == -170.0)
    assert(Srs.lon180to360(-170.0) == 190.0)
    assert(Srs.lon360to180(10.0) == 10.0)
  }

  test("dd2dms/dms2dd roundtrip (geolib.py:242-262)") {
    val (d, m, s) = Srs.dd2dms(-122.34567)
    assert(d == -122.0 && m == 20.0 && math.abs(s - 44.412) < 1e-6)
    assert(math.abs(Srs.dms2dd(-122, 20, 44.412) - (-122.34567)) < 1e-9)
  }

  test("dms2dd_str / dm2dd (geolib.py:264-284)") {
    assert(math.abs(Srs.dms2ddStr("122 20 44.412 W") - (-122.34567)) < 1e-9)
    assert(math.abs(Srs.dms2ddStr("47 36 28.8") - 47.608) < 1e-9)
    // consecutive delimiters collapse like the reference's empty-string filter
    assert(math.abs(Srs.dms2ddStr("47  36  28.8 N") - 47.608) < 1e-9)
    assert(math.abs(Srs.dm2dd(47, 36.48) - 47.608) < 1e-9)
  }

  test("scale_ps: area scale = 1 at 70N (true-scale lat), matches constants (geolib.py:168-214)") {
    // at the reference latitude k=1 so scale=1 (up to the reference's stored
    // 8-digit m70_t70 constant)
    assert(math.abs(Srs.scalePs(70.0) - 1.0) < 1e-6)
    assert(math.abs(Srs.scalePs(-71.0) - 1.0) < 1e-4)
    // pole is clamped, finite
    assert(!Srs.scalePs(90.0).isNaN && Srs.scalePs(90.0) > 0)
  }

  test("ZCell encode/decode/parent/children/extent") {
    val c = ZCell.encode(-122.3, 47.6, 12)
    assert(ZCell.res(c) == 12)
    val e = ZCell.extent(c)
    assert(e.containsPoint(-122.3, 47.6))
    val p = ZCell.parent(c)
    assert(ZCell.res(p) == 11 && ZCell.extent(p).containsPoint(-122.3, 47.6))
    val kids = ZCell.children(p)
    assert(kids.size == 4 && kids.contains(c))
    // child extents tile the parent exactly (aperture 4)
    assert(Extent.unionAll(kids.map(ZCell.extent)) == ZCell.extent(p))
  }

  test("ZCell ring/kRing sizes and lon wrap") {
    val c = ZCell.encode(0.0, 0.0, 10)
    assert(ZCell.ring(c, 0) == Seq(c))
    assert(ZCell.ring(c, 1).size == 8)
    assert(ZCell.ring(c, 2).size == 16)
    assert(ZCell.kRing(c, 2).size == 25)
    // at the anti-meridian the ring must wrap, not clip
    val cam = ZCell.encode(-179.99, 0.0, 10)
    assert(ZCell.ring(cam, 1).size == 8)
  }

  test("ZCell cover of an extent enumerates exactly the intersecting cells") {
    val e = Extent(-1.0, -1.0, 1.0, 1.0)
    val cells = ZCell.cover(e, 8)
    assert(cells.nonEmpty)
    cells.foreach(c => assert(ZCell.extent(c).intersects(e)))
    // every corner point of e is covered
    for ((x, y) <- Seq((-0.99, -0.99), (0.99, 0.99), (-0.99, 0.99), (0.99, -0.99)))
      assert(cells.contains(ZCell.encode(x, y, 8)))
  }

  test("HexCell encode/center/kRing/parent") {
    val c = HexCell.encode(-122.3, 47.6, 8)
    assert(HexCell.res(c) == 8)
    val (cx, cy) = HexCell.center(c)
    // center within one edge length of the input point
    assert(math.abs(cx - (-122.3)) < 2 * HexCell.edge(8) && math.abs(cy - 47.6) < 2 * HexCell.edge(8))
    assert(HexCell.encode(cx, cy, 8) == c)   // center re-encodes to itself
    assert(HexCell.neighbors(c).size == 6)
    assert(HexCell.ring(c, 1).size == 6 && HexCell.ring(c, 2).size == 12)
    assert(HexCell.kRing(c, 2).size == 19)   // 1 + 6 + 12
    assert(HexCell.res(HexCell.parent(c)) == 7)
  }

  test("S2Lite face/encode/parent/center roundtrip") {
    val pts = Seq((0.0, 0.0, 0), (120.0, 10.0, 1), (10.0, 80.0, 2),
                  (179.0, -5.0, 3), (-90.0, -10.0, 4), (0.0, -85.0, 5))
    for ((lon, lat, face) <- pts) {
      val c = S2Lite.encode(lon, lat, 15)
      assert(S2Lite.face(c) == face, s"face for ($lon,$lat)")
      assert(S2Lite.level(c) == 15)
      val (clon, clat) = S2Lite.center(c)
      // center must re-encode to the same cell
      assert(S2Lite.encode(clon, clat, 15) == c)
      val p = S2Lite.parent(c)
      assert(S2Lite.level(p) == 14 && S2Lite.face(p) == face)
      // parent of the center's cell at level 14 is identical
      assert(S2Lite.encode(clon, clat, 14) == p)
    }
  }

  test("S2 quadratic st<->uv roundtrip") {
    for (u <- Seq(-1.0, -0.5, 0.0, 0.3, 1.0)) {
      assert(math.abs(S2Lite.stToUv(S2Lite.uvToSt(u)) - u) < 1e-12)
    }
  }

  test("PIP ray crossing: box, concave, hole (geom2mask_PIL semantics geolib.py:1532-1561)") {
    val box = Polygon.box(Extent(0, 0, 10, 10))
    assert(box.contains(5, 5) && !box.contains(11, 5) && !box.contains(-1, -1))
    // concave "C" shape
    val c = Polygon(Ring(
      Array(0, 10, 10, 4, 4, 10, 10, 0, 0),
      Array(0, 0, 3, 3, 7, 7, 10, 10, 0)), Nil)
    assert(c.contains(2, 5))          // in the spine
    assert(!c.contains(7, 5))         // in the notch
    assert(c.contains(7, 1))          // lower arm
    // donut: hole excluded
    val donut = Polygon(Polygon.box(Extent(0, 0, 10, 10)).shell,
      Seq(Polygon.box(Extent(3, 3, 7, 7)).shell))
    assert(donut.contains(1, 1) && !donut.contains(5, 5))
  }

  test("PIP consistent with bbox prefilter (property, geolib.py:1332-1335)") {
    val poly = Polygon(Ring(Array(0, 8, 4, 0), Array(0, 2, 9, 0)), Nil)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val x = rnd.nextDouble() * 12 - 1; val y = rnd.nextDouble() * 12 - 1
      if (poly.contains(x, y)) assert(poly.bbox.containsPoint(x, y))
    }
  }

  test("WKB roundtrip polygon + multipolygon") {
    val donut = Polygon(Polygon.box(Extent(0, 0, 10, 10)).shell,
      Seq(Polygon.box(Extent(3, 3, 7, 7)).shell))
    val mp = MultiPolygon(Seq(donut, Polygon.box(Extent(20, 20, 30, 30))))
    val rt = Wkb.read(Wkb.writeMultiPolygon(mp))
    assert(rt.polys.size == 2)
    assert(rt.contains(1, 1) && !rt.contains(5, 5) && rt.contains(25, 25))
    val single = Wkb.read(Wkb.writePolygon(donut))
    assert(single.contains(1, 1) && !single.contains(5, 5))
  }

  test("covering cells contain every interior sample point (property)") {
    val poly = Polygon(Ring(Array(-3, 5, 2, -3), Array(-2, -1, 6, -2)), Nil)
    val mp = MultiPolygon(Seq(poly))
    val cells = mp.coveringCells(9).toSet
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 300) {
      val x = rnd.nextDouble() * 10 - 4; val y = rnd.nextDouble() * 10 - 3
      if (mp.contains(x, y)) assert(cells.contains(ZCell.encode(x, y, 9)))
    }
  }

  test("haversine sanity: 1 deg lon at equator ~111.19 km") {
    assert(math.abs(Srs.haversineM(0, 0, 1, 0) - 111195.0) < 100)
    assert(Srs.haversineM(10, 20, 10, 20) == 0.0)
  }
}

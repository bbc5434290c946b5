package graft.geo

/** Exact boolean operations (union / intersection) on simple polygons via a
  * vertical trapezoid sweep — the engine-side analog of the reference's OGR
  * `geom_union` / `geom_intersection` folds (`geolib.py:1355-1432`), which
  * the r2 envelope fold only approximated (over-covering non-rectangular
  * footprints).
  *
  * Construction (classic public computational-geometry decomposition):
  * event x-coordinates = every vertex x plus every pairwise edge-crossing x;
  * inside each slab no edges cross, so the active edges (those spanning the
  * slab) have a total y-order at the slab midpoint. Walking that order while
  * toggling each input's even-odd parity yields the coverage count between
  * consecutive edges; intervals passing `keep(coverage)` become trapezoids.
  *
  * The result is the EXACT region (area, extent, and point containment all
  * agree with the true boolean result) represented as a non-dissolved
  * MultiPolygon of trapezoids — the representation every consumer in this
  * engine (area/extent/PIP/rasterize) treats identically to a dissolved
  * polygon. Cost is O(E² + slabs·E log E) with E total edges: the aggregate
  * bounds E by dissolving periodically, so hot groups never accumulate
  * unbounded vertex lists. */
object GeomBool {
  private final case class Edge(x0: Double, y0: Double, x1: Double, y1: Double, g: Int) {
    def yAt(x: Double): Double =
      if (x1 == x0) y0 else y0 + (y1 - y0) * ((x - x0) / (x1 - x0))
  }

  /** One even-odd group per input polygon-with-holes. `keep` maps the
    * number of groups covering an interval to membership. */
  def boolOp(groups: Seq[Polygon], keep: Int => Boolean): MultiPolygon = {
    val edges = scala.collection.mutable.ArrayBuffer.empty[Edge]
    groups.zipWithIndex.foreach { case (p, g) =>
      (p.shell +: p.holes).foreach { r =>
        var i = 0
        while (i < r.n - 1) {
          val (xa, ya, xb, yb) = (r.xs(i), r.ys(i), r.xs(i + 1), r.ys(i + 1))
          if (xa != xb) { // vertical edges lie on slab boundaries: no parity effect
            if (xa < xb) edges += Edge(xa, ya, xb, yb, g)
            else edges += Edge(xb, yb, xa, ya, g)
          }
          i += 1
        }
        // tolerate unclosed rings (closing segment implied)
        if (r.n > 1 && (r.xs(0) != r.xs(r.n - 1) || r.ys(0) != r.ys(r.n - 1))) {
          val (xa, ya, xb, yb) = (r.xs(r.n - 1), r.ys(r.n - 1), r.xs(0), r.ys(0))
          if (xa != xb) {
            if (xa < xb) edges += Edge(xa, ya, xb, yb, g)
            else edges += Edge(xb, yb, xa, ya, g)
          }
        }
      }
    }
    if (edges.isEmpty) return MultiPolygon(Nil)

    // event xs: vertices + pairwise proper crossings
    val xsB = scala.collection.mutable.ArrayBuffer.empty[Double]
    edges.foreach { e => xsB += e.x0; xsB += e.x1 }
    var i = 0
    while (i < edges.length) {
      var j = i + 1
      while (j < edges.length) {
        crossingX(edges(i), edges(j)).foreach(xsB += _)
        j += 1
      }
      i += 1
    }
    val xs = xsB.distinct.sorted.toArray

    val nG = groups.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Polygon]
    // open trapezoids carried across slab boundaries: an interval bounded by
    // the SAME (lo, hi) edge pair in consecutive slabs EXTENDS instead of
    // emitting one trapezoid per slab — so the dissolved representation's
    // size tracks the region's true boundary complexity, not the event
    // count (10k overlapping footprints whose union is one blob dissolve to
    // ~blob-boundary trapezoids, which is what keeps GeomUnionAgg's
    // map-side buffer bounded). A pair that pinches to zero height at a
    // boundary (edges crossing there) closes and reopens — no bowtie rings.
    val open = scala.collection.mutable.LinkedHashMap.empty[(Edge, Edge), Double]
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(Edge, Edge)]
    var k = 0
    while (k < xs.length - 1) {
      val x1 = xs(k); val x2 = xs(k + 1)
      if (x2 > x1) {
        val xm = x1 + (x2 - x1) / 2
        val active = edges.filter(e => e.x0 <= x1 && e.x1 >= x2)
          .sortBy(e => (e.yAt(xm), e.yAt(x2), e.g))
        val parity = new Array[Boolean](nG)
        var covered = 0
        var lower: Edge = null
        pairs.clear()
        var a = 0
        while (a < active.length) {
          val e = active(a)
          if (parity(e.g)) covered -= 1 else covered += 1
          parity(e.g) = !parity(e.g)
          val inside = keep(covered)
          if (inside && lower == null) lower = e
          else if (!inside && lower != null) {
            pairs += ((lower, e))
            lower = null
          }
          a += 1
        }
        val pairSet = pairs.toSet
        val toClose = open.keysIterator.filter { case p @ (lo, hi) =>
          !pairSet.contains(p) || !(hi.yAt(x1) > lo.yAt(x1))
        }.toList
        toClose.foreach { case p @ (lo, hi) =>
          emitTrap(out, lo, hi, open(p), x1); open.remove(p)
        }
        pairs.foreach { p => if (!open.contains(p)) open(p) = x1 }
      }
      k += 1
    }
    open.foreach { case ((lo, hi), xStart) => emitTrap(out, lo, hi, xStart, xs.last) }
    MultiPolygon(out.toSeq)
  }

  /** x of a proper interior crossing of two segments, if any. */
  private def crossingX(a: Edge, b: Edge): Option[Double] = {
    val d1x = a.x1 - a.x0; val d1y = a.y1 - a.y0
    val d2x = b.x1 - b.x0; val d2y = b.y1 - b.y0
    val den = d1x * d2y - d1y * d2x
    if (den == 0.0) None // parallel / collinear: no new event needed
    else {
      val t = ((b.x0 - a.x0) * d2y - (b.y0 - a.y0) * d2x) / den
      val u = ((b.x0 - a.x0) * d1y - (b.y0 - a.y0) * d1x) / den
      if (t > 0 && t < 1 && u > 0 && u < 1) Some(a.x0 + t * d1x) else None
    }
  }

  private def emitTrap(out: scala.collection.mutable.ArrayBuffer[Polygon],
                       lo: Edge, hi: Edge, x1: Double, x2: Double): Unit = {
    val y1l = lo.yAt(x1); val y2l = lo.yAt(x2)
    val y1h = hi.yAt(x1); val y2h = hi.yAt(x2)
    if (y1h - y1l > 0 || y2h - y2l > 0) // skip zero-area slivers
      out += Polygon(Ring(
        Array(x1, x2, x2, x1, x1),
        Array(y1l, y2l, y2h, y1h, y1l)), Nil)
  }

  /** Union of geometries — `geom_union` `geolib.py:1355-1362`. Each input
    * polygon part is its own even-odd group, so overlapping inputs stay
    * covered (parity across groups never cancels). */
  def unionAll(geoms: Seq[MultiPolygon]): MultiPolygon =
    boolOp(geoms.flatMap(_.polys), _ >= 1)

  /** Intersection of geometries — `geom_intersection` `geolib.py:1386-1398`.
    * Pairwise fold (cov == 2 against the running region), associative. */
  def intersectionAll(geoms: Seq[MultiPolygon]): MultiPolygon =
    geoms.reduceLeft { (acc, g) =>
      // each side collapses to one even-odd group via a pre-dissolve so
      // overlapping parts inside one side cannot flip parity
      val aU = unionAll(Seq(acc)); val bU = unionAll(Seq(g))
      boolOp(Seq(mergeGroup(aU), mergeGroup(bU)), _ >= 2)
    }

  /** Trapezoid sets are disjoint, so all rings of one region form a single
    * valid even-odd group. */
  private def mergeGroup(mp: MultiPolygon): Polygon =
    if (mp.polys.isEmpty) Polygon(Ring(Array.empty, Array.empty), Nil)
    else Polygon(mp.polys.head.shell,
      mp.polys.head.holes ++ mp.polys.tail.flatMap(p => p.shell +: p.holes))
}

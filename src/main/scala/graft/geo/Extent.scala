package graft.geo

/** Axis-aligned extent `[xmin, ymin, xmax, ymax]` in some CRS.
  *
  * Format convention follows the reference (`geolib.py:1225-1232`): GDAL-style
  * `[xmin, ymin, xmax, ymax]` lists. All operations are pure and deterministic
  * so they can run identically on driver and executors and be re-expressed as
  * Catalyst column expressions.
  */
final case class Extent(xmin: Double, ymin: Double, xmax: Double, ymax: Double) {
  def width: Double  = xmax - xmin
  def height: Double = ymax - ymin
  def isEmpty: Boolean = xmax <= xmin || ymax <= ymin

  /** Union (envelope of both) — `geolib.py:1355-1382` (`geom_union` over footprints). */
  def union(o: Extent): Extent =
    Extent(math.min(xmin, o.xmin), math.min(ymin, o.ymin),
           math.max(xmax, o.xmax), math.max(ymax, o.ymax))

  /** Intersection — `geolib.py:1386-1432`; disjoint inputs are an error in the
    * reference (`warplib.py:404-405`), represented here as None. */
  def intersection(o: Extent): Option[Extent] = {
    val e = Extent(math.max(xmin, o.xmin), math.max(ymin, o.ymin),
                   math.min(xmax, o.xmax), math.min(ymax, o.ymax))
    if (e.isEmpty) None else Some(e)
  }

  def intersects(o: Extent): Boolean =
    xmin < o.xmax && o.xmin < xmax && ymin < o.ymax && o.ymin < ymax

  def containsPoint(x: Double, y: Double): Boolean =
    x >= xmin && x <= xmax && y >= ymin && y <= ymax   // pt_within_extent geolib.py:1332-1335

  /** Pad by percentage of width/height (perc=true) or fixed map units —
    * `pad_extent` `geolib.py:1339-1350`. */
  def pad(amount: Double, perc: Boolean = false): Extent = {
    val (dx, dy) = if (perc) (width * amount, height * amount) else (amount, amount)
    Extent(xmin - dx, ymin - dy, xmax + dx, ymax + dy)
  }

  /** Round each coordinate to the nearest multiple of `prec` —
    * `round_nearest`/`extent_round` `geolib.py:1273-1287`. */
  def roundTo(prec: Double): Extent =
    Extent(Extent.roundNearest(xmin, prec), Extent.roundNearest(ymin, prec),
           Extent.roundNearest(xmax, prec), Extent.roundNearest(ymax, prec))

  /** Extent equality within precision — `extent_compare` `geolib.py:1435-1442`. */
  def approxEquals(o: Extent, prec: Double): Boolean =
    roundTo(prec) == o.roundTo(prec)

  def toSeq: Seq[Double] = Seq(xmin, ymin, xmax, ymax)
}

object Extent {
  /** `round_nearest(x, a) = round(x / a) * a` — `geolib.py:1273-1276`.
    * Python 3 round() is banker's (half-to-even) → math.rint. */
  def roundNearest(x: Double, a: Double): Double = math.rint(x / a) * a

  /** Resolution equality within precision — `res_compare` `geolib.py:1444-1448`. */
  def resCompare(r1: Double, r2: Double, prec: Double): Boolean =
    roundNearest(r1, prec) == roundNearest(r2, prec)

  /** Fold a non-empty list: union of all — analog of `ds_geom_union_extent`
    * `geolib.py:1377-1382`. */
  def unionAll(es: Iterable[Extent]): Extent = es.reduce(_ union _)

  /** Fold a non-empty list: intersection of all — analog of
    * `ds_geom_intersection_extent` `geolib.py:1425-1432`. */
  def intersectionAll(es: Iterable[Extent]): Option[Extent] =
    es.map(Option(_)).reduce { (a, b) =>
      for (x <- a; y <- b; i <- x.intersection(y)) yield i
    }
}

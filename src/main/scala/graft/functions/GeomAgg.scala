package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import graft.geo.{GeomBool, MultiPolygon, Wkb}

/** Exact geometry-union aggregate over WKB — the distributed form of the
  * reference's `geom_union` fold (`geolib.py:1355-1362`), replacing the r2
  * envelope-only fold (SURVEY §2.11). The buffer accumulates raw polygon
  * parts and DISSOLVES (GeomBool trapezoid sweep) whenever it exceeds
  * `dissolveAt`, so partial aggregation stays bounded by the dissolved
  * region's complexity rather than the input count — the property that lets
  * a 100 TB footprint union run as an ordinary map-side-combine groupBy. */
class GeomUnionAgg(dissolveAt: Int = 512)
    extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] with Serializable {
  def zero: Array[Byte] = Wkb.writeMultiPolygon(MultiPolygon(Nil))
  def reduce(buf: Array[Byte], wkb: Array[Byte]): Array[Byte] =
    append(buf, if (wkb == null) Nil else Wkb.read(wkb).polys)
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    append(a, Wkb.read(b).polys)
  def finish(buf: Array[Byte]): Array[Byte] =
    Wkb.writeMultiPolygon(GeomBool.unionAll(Seq(Wkb.read(buf))))
  private def append(buf: Array[Byte], polys: Seq[graft.geo.Polygon]): Array[Byte] = {
    val cur = Wkb.read(buf).polys ++ polys
    if (cur.length > dissolveAt)
      Wkb.writeMultiPolygon(GeomBool.unionAll(Seq(MultiPolygon(cur))))
    else Wkb.writeMultiPolygon(MultiPolygon(cur))
  }
  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Exact geometry-intersection aggregate — `ds_geom_intersection`
  * `geolib.py:1386-1398`. Pairwise region fold (associative); the empty
  * buffer is the universe sentinel. */
class GeomIntersectionAgg
    extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] with Serializable {
  def zero: Array[Byte] = Array.emptyByteArray
  def reduce(buf: Array[Byte], wkb: Array[Byte]): Array[Byte] =
    if (wkb == null) buf
    else if (buf.isEmpty) Wkb.writeMultiPolygon(GeomBool.unionAll(Seq(Wkb.read(wkb))))
    else Wkb.writeMultiPolygon(
      GeomBool.intersectionAll(Seq(Wkb.read(buf), Wkb.read(wkb))))
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else Wkb.writeMultiPolygon(GeomBool.intersectionAll(Seq(Wkb.read(a), Wkb.read(b))))
  def finish(buf: Array[Byte]): Array[Byte] =
    if (buf.isEmpty) Wkb.writeMultiPolygon(MultiPolygon(Nil)) else buf
  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object GeomFunctions {
  /** `geom_union(wkb)` as a DataFrame aggregate column. */
  def geomUnion(c: Column): Column = udaf(new GeomUnionAgg(), Encoders.BINARY).apply(c)
  /** `geom_intersection(wkb)` as a DataFrame aggregate column. */
  def geomIntersection(c: Column): Column =
    udaf(new GeomIntersectionAgg(), Encoders.BINARY).apply(c)
}

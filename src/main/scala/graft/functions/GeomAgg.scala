package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import graft.geo.{GeomBool, MultiPolygon, Wkb}

/** Exact geometry-union aggregate over WKB — the distributed form of the
  * reference's `geom_union` fold (`geolib.py:1355-1362`), replacing the r2
  * envelope-only fold (SURVEY §2.11). The buffer accumulates raw polygon
  * parts and DISSOLVES (GeomBool trapezoid sweep, with cross-slab trapezoid
  * merging so the dissolved size tracks the region's boundary complexity)
  * whenever it exceeds an ADAPTIVE threshold: after each dissolve the
  * threshold becomes 2× the dissolved size (floored at `dissolveAt`), so a
  * group whose true union is genuinely complex pays amortized O(log) sweeps
  * instead of one per subsequent row. The threshold rides in a 4-byte
  * buffer header. This is the property that lets a 100 TB footprint union
  * run as an ordinary map-side-combine groupBy. */
class GeomUnionAgg(dissolveAt: Int = 512)
    extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] with Serializable {
  private def pack(thresh: Int, wkb: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](4 + wkb.length)
    out(0) = (thresh >>> 24).toByte; out(1) = (thresh >>> 16).toByte
    out(2) = (thresh >>> 8).toByte; out(3) = thresh.toByte
    System.arraycopy(wkb, 0, out, 4, wkb.length)
    out
  }
  private def unpack(buf: Array[Byte]): (Int, Array[Byte]) = {
    val t = ((buf(0) & 0xff) << 24) | ((buf(1) & 0xff) << 16) |
            ((buf(2) & 0xff) << 8) | (buf(3) & 0xff)
    (t, java.util.Arrays.copyOfRange(buf, 4, buf.length))
  }
  def zero: Array[Byte] = pack(dissolveAt, Wkb.writeMultiPolygon(MultiPolygon(Nil)))
  def reduce(buf: Array[Byte], wkb: Array[Byte]): Array[Byte] =
    append(buf, if (wkb == null) Nil else Wkb.read(wkb).polys)
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (tb, wb) = unpack(b)
    val (ta, wa) = unpack(a)
    append(pack(math.max(ta, tb), wa), Wkb.read(wb).polys)
  }
  def finish(buf: Array[Byte]): Array[Byte] = {
    val (_, w) = unpack(buf)
    Wkb.writeMultiPolygon(GeomBool.unionAll(Seq(Wkb.read(w))))
  }
  private def append(buf: Array[Byte], polys: Seq[graft.geo.Polygon]): Array[Byte] = {
    val (thresh, w) = unpack(buf)
    val cur = Wkb.read(w).polys ++ polys
    if (cur.length > thresh) {
      val dissolved = GeomBool.unionAll(Seq(MultiPolygon(cur)))
      pack(math.max(dissolveAt, 2 * dissolved.polys.length),
           Wkb.writeMultiPolygon(dissolved))
    } else pack(thresh, Wkb.writeMultiPolygon(MultiPolygon(cur)))
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

package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Codec, ImageRow, ImageTable}

class EdgeMaskSpec extends AnyFunSuite {
  private val ndv = ImageTable.Ndv

  private def img(px: Array[Float], w: Int, h: Int): ImageRow =
    ImageRow(s"img_test", Codec.encode(px, w, h, "raw"), w, h, "raw",
      "c", 0L, 0.0, 0.0, 1.0, ImageTable.Crs, ndv.toDouble,
      new java.sql.Timestamp(0L))

  test("edge envelope cuts undercuts via row spans but re-includes interior holes") {
    val w = 8; val h = 8
    val px = Array.fill(w * h)(7.0f)
    // undercut: a notch open to the RIGHT edge, rows 2..5 × cols 5..7
    for (y <- 2 to 5; x <- 5 to 7) px(y * w + x) = ndv
    // interior hole at (row 6, col 2), fully surrounded by valid data
    px(6 * w + 2) = ndv
    val (out, n) = RasterOps.edgeEnvelope(img(px, w, h))
    // notch is outside the row spans of rows 2..5 → excluded; hole inside
    // both spans → envelope member. 64 − 12 notch px = 52.
    assert(n == 52)
    for (y <- 2 to 5; x <- 5 to 7) assert(out(y * w + x) == ndv, s"notch ($y,$x)")
    // hole is an envelope member but carries ndv without a fillValue...
    assert(out(6 * w + 2) == ndv)
    // ...and the requested fill value with one (apply_edgemask's unmasking)
    val (filled, n2) = RasterOps.edgeEnvelope(img(px, w, h), Some(99.0f))
    assert(n2 == 52 && filled(6 * w + 2) == 99.0f)
    // valid pixels pass through untouched
    assert(filled(0) == 7.0f && filled(7 * w + 7) == 7.0f)
  }

  test("edge envelope of a margin rectangle is exactly the valid rectangle") {
    val i = 5 // margin image (i % 5 == 0): 3-px NDV ring
    val g = ImageTable.gridOf(i)
    val row = ImageTable.row(i)
    val (out, n) = RasterOps.edgeEnvelope(row)
    assert(n == (g.w - 6) * (g.h - 6))
    assert(out.count(_ != ndv) == n) // no holes in the synthetic interior
  }

  test("fully-masked image yields an empty envelope") {
    val px = Array.fill(16)(ndv)
    val (_, n) = RasterOps.edgeEnvelope(img(px, 4, 4))
    assert(n == 0)
  }
}

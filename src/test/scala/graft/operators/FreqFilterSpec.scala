package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ImageTable

class FreqFilterSpec extends AnyFunSuite {
  private val ndv = ImageTable.Ndv

  test("fft2 inverse is an exact roundtrip (scaled tolerance)") {
    val w = 16; val h = 8
    val re = Array.tabulate(w * h)(i => ((i * 37) % 101 - 50).toDouble)
    val im = new Array[Double](w * h)
    val orig = re.clone()
    RasterOps.fft2(re, im, w, h)
    RasterOps.fft2(re, im, w, h, inverse = true)
    for (i <- 0 until w * h) {
      assert(math.abs(re(i) - orig(i)) < 1e-9 * 101 * w * h, s"re($i)")
      assert(math.abs(im(i)) < 1e-9 * 101 * w * h, s"im($i)")
    }
  }

  test("freq low-pass removes a checkerboard riding on a constant; mask restored") {
    val w = 32; val h = 32
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (100.0 + (if ((x + y) % 2 == 0) 5.0 else -5.0)).toFloat // Nyquist noise
    }
    px(5 * w + 7) = ndv
    val out = RasterOps.freqFilter(px, w, h, ndv, keepBelow = 4.0)
    assert(out(5 * w + 7) == ndv) // mask restored
    for (i <- 0 until w * h if out(i) != ndv)
      assert(math.abs(out(i) - 100.0) < 0.5, s"px $i = ${out(i)}")
  }

  test("freq low-pass keeps a pure constant exactly (DC survives)") {
    val px = Array.fill(16 * 16)(42.0f)
    val out = RasterOps.freqFilter(px, 16, 16, ndv, keepBelow = 2.0)
    out.foreach(v => assert(math.abs(v - 42.0f) < 1e-4))
  }

  test("freqDominant finds the square-wave fundamental in the half-plane") {
    val w = 32; val h = 32
    // period-8 square wave along x → fundamental at kx = 32/8 = 4, ky = 0
    val px = Array.tabulate(w * h) { i =>
      val x = i % w
      (if ((x / 4) % 2 == 0) 110.0 else 90.0).toFloat
    }
    assert(RasterOps.freqDominant(px, w, h, ndv) == (4, 0))
    // and along y → (0, 4), proving the ky>0 full-kx branch
    val py = Array.tabulate(w * h) { i =>
      val y = i / w
      (if ((y / 4) % 2 == 0) 110.0 else 90.0).toFloat
    }
    assert(RasterOps.freqDominant(py, w, h, ndv) == (0, 4))
  }
}

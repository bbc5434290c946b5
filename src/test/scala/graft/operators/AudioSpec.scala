package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.AudioTable

class AudioSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Naive O(N²) DFT power at bin k — the independent reference for both
    * the Goertzel recursion and the FFT. */
  private def dftPower(s: Array[Int], k: Int): Double = {
    var re = 0.0; var im = 0.0
    val n = s.length
    for (t <- 0 until n) {
      val a = -2.0 * math.Pi * k * t / n
      re += s(t) * math.cos(a); im += s(t) * math.sin(a)
    }
    re * re + im * im
  }

  test("PCM16 codec roundtrip is exact, incl. negative and extreme values") {
    val s = Array(0, 1, -1, 32767, -32768, 12345, -12345, 255, -256)
    assert(AudioTable.decodePcm16(AudioTable.encodePcm16(s)).sameElements(s))
    val clip = AudioTable.row(7)
    assert(AudioTable.decodePcm16(clip.bytes)
      .sameElements(Array.tabulate(AudioTable.N)(t => AudioTable.sample(7, t))))
  }

  test("features match a direct independent computation") {
    val df = Audio.features(spark, AudioTable.generate(spark, 5)).collect()
      .map(r => r.getString(0) -> r).toMap
    for (i <- 0 until 5) {
      val s = Array.tabulate(AudioTable.N)(t => AudioTable.sample(i, t))
      val r = df(AudioTable.audioIdOf(i))
      assert(r.getLong(3) == s.map(math.abs).max.toLong)
      assert(r.getDouble(4) == s.map(_.toLong).sum.toDouble / s.length)
      assert(r.getDouble(5) ==
        math.sqrt(s.map(v => v.toLong * v).sum.toDouble / s.length))
      val zc = (1 until s.length).count(t => s(t - 1).toLong * s(t) < 0)
      assert(r.getLong(6) == zc.toLong)
    }
  }

  test("goertzel equals the naive DFT bin power (all probe bins, 6 clips)") {
    val df = Audio.goertzel(spark, AudioTable.generate(spark, 6), Seq(16, 32, 64))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for (i <- 0 until 6; k <- Seq(16, 32, 64)) {
      val s = Array.tabulate(AudioTable.N)(t => AudioTable.sample(i, t))
      val want = dftPower(s, k)
      val got = df((AudioTable.audioIdOf(i), k))
      // tolerance scales with TOTAL energy, not the bin: near-null bins are
      // catastrophic cancellations of ~N·s² terms in both algorithms
      val scale = s.map(v => v.toDouble * v).sum * s.length
      assert(math.abs(got - want) <= 1e-12 * scale,
        s"clip $i bin $k: goertzel $got vs dft $want")
    }
  }

  test("goertzel resolves the fundamental: aligned-period clip peaks at N/P") {
    // clip 0: P = 16 divides N = 1024 → fundamental exactly at bin 64
    val s = Array.tabulate(AudioTable.N)(t => AudioTable.sample(0, t))
    val fund = dftPower(s, 64)
    assert(fund > 100.0 * dftPower(s, 50)) // non-harmonic bin is noise-level
  }

  test("fft matches the naive DFT and Parseval on a synthetic clip") {
    val s = Array.tabulate(256)(t => AudioTable.sample(3, t))
    val re = s.map(_.toDouble); val im = new Array[Double](256)
    Audio.fft(re, im)
    // spot bins vs naive DFT (scaled tolerance: values are ~1e8)
    for (k <- Seq(0, 1, 17, 64, 128, 200)) {
      var wr = 0.0; var wi = 0.0
      for (t <- 0 until 256) {
        val a = -2.0 * math.Pi * k * t / 256
        wr += s(t) * math.cos(a); wi += s(t) * math.sin(a)
      }
      assert(math.abs(re(k) - wr) <= 1e-6 * math.max(1.0, math.abs(wr)) + 1e-4)
      assert(math.abs(im(k) - wi) <= 1e-6 * math.max(1.0, math.abs(wi)) + 1e-4)
    }
    // Parseval: Σ|x|² = Σ|X|²/N
    val lhs = s.map(v => v.toDouble * v).sum
    val rhs = (0 until 256).map(k => re(k) * re(k) + im(k) * im(k)).sum / 256
    assert(math.abs(lhs - rhs) <= 1e-9 * lhs)
  }

  test("dominantBin agrees with naive-DFT argmax for every period class") {
    val df = Audio.dominantBin(spark, AudioTable.generate(spark, 13))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    for (i <- 0 until 13) {
      val s = Array.tabulate(AudioTable.N)(t => AudioTable.sample(i, t))
      val want = (1 until AudioTable.N / 2).maxBy(k => dftPower(s, k))
      assert(df(AudioTable.audioIdOf(i)) == want, s"clip $i (P=${AudioTable.periodOf(i)})")
    }
  }
}

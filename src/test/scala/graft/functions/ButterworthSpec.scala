package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import Butterworth._

/** The Butterworth design has exact defining properties — maximally-flat
  * unit DC gain, half-power (|H|^2 = 1/2) at the prewarped cutoff, monotone
  * magnitude, -6N dB/octave asymptotic rolloff — so the design code is
  * verified against the mathematics rather than against library output.
  * The filtfilt contract (steady-state init, odd padding, zero phase) has
  * its own exactness tests. Reference behavior: `butter_low`
  * filtlib.py:483-507. */
class ButterworthSpec extends AnyFunSuite {

  val orders = Seq(1, 2, 3, 4, 6)
  val wns = Seq(0.05, 0.1, 0.25, 0.5, 0.8)

  test("unit DC gain: sum(b) == sum(a)") {
    for (n <- orders; wn <- wns) {
      val c = lowpass(n, wn)
      assert(c.a(0) == 1.0)
      val dc = c.b.sum / c.a.sum
      // high order + low cutoff clusters the poles near z=1, which
      // conditions the polynomial expansion (order 6, wn 0.05: ~7e-11)
      val tol = if (n <= 4) 1e-12 else 1e-9
      assert(math.abs(dc - 1.0) < tol, s"order=$n wn=$wn dc=$dc")
    }
  }

  test("half-power exactly at the cutoff frequency (Butterworth definition)") {
    for (n <- orders; wn <- wns) {
      val c = lowpass(n, wn)
      val g2 = gainSq(c, math.Pi * wn)
      assert(math.abs(g2 - 0.5) < 1e-9, s"order=$n wn=$wn |H|^2=$g2")
    }
  }

  test("magnitude is monotone decreasing in frequency") {
    for (n <- orders; wn <- Seq(0.1, 0.5)) {
      val c = lowpass(n, wn)
      var prev = Double.MaxValue
      for (i <- 1 to 200) {
        val g = gainSq(c, math.Pi * i / 201.0)
        assert(g <= prev + 1e-12, s"order=$n wn=$wn not monotone at i=$i")
        prev = g
      }
    }
  }

  test("stopband rolloff follows the bilinear-warped Butterworth law") {
    // analog |H|^2 = 1/(1+(w/wc)^2N) with the bilinear map w = tan(pi*f/2),
    // so the drop between two digital frequencies f1,f2 >> cutoff is
    // 20*N*log10(tan(pi*f2/2)/tan(pi*f1/2)) dB — the naive "6N dB/octave"
    // only holds where tan is linear; this asserts the exact warped law.
    for (n <- Seq(2, 3, 4)) {
      val c = lowpass(n, 0.05)
      val g1 = gainSq(c, math.Pi * 0.2)
      val g2 = gainSq(c, math.Pi * 0.4)
      val measured = 10.0 * math.log10(g1 / g2)
      val predicted = 20.0 * n * math.log10(math.tan(math.Pi * 0.2) / math.tan(math.Pi * 0.1))
      assert(math.abs(measured - predicted) < 0.5, s"order=$n measured=$measured predicted=$predicted")
    }
  }

  test("lfilter with zi*c on constant input returns the constant exactly-ish") {
    for (n <- orders; cst <- Seq(1.0, -7.25, 1234.5)) {
      val c = lowpass(n, 0.2)
      val zi = lfilterZi(c)
      val x = Array.fill(50)(cst)
      val y = lfilter(c, x, zi.map(_ * cst))
      // steady state from the first sample: no transient at all
      y.foreach(v => assert(math.abs(v - cst) < 1e-9 * math.max(1.0, math.abs(cst)), s"order=$n y=$v"))
    }
  }

  test("filtfilt preserves a constant and is length-preserving") {
    val c = lowpass(3, 0.1)
    val x = Array.fill(40)(3.75)
    val y = filtfilt(c, x)
    assert(y.length == x.length)
    y.foreach(v => assert(math.abs(v - 3.75) < 1e-9))
  }

  test("filtfilt passes slow sinusoids, kills fast ones, with zero phase") {
    val c = lowpass(3, 0.1) // cutoff at 0.1 * Nyquist
    val nSamp = 400
    // slow: period 100 samples (freq 0.02/Nyquist, 5x below cutoff)
    val slow = Array.tabulate(nSamp)(i => math.sin(2 * math.Pi * i / 100.0))
    // fast: period 4 samples (freq 0.5/Nyquist, 5x above cutoff)
    val fast = Array.tabulate(nSamp)(i => math.sin(2 * math.Pi * i / 4.0))
    val ySlow = filtfilt(c, slow)
    val yFast = filtfilt(c, fast)
    val interior = 100 until 300
    val slowAmp = interior.map(i => math.abs(ySlow(i))).max
    val fastAmp = interior.map(i => math.abs(yFast(i))).max
    assert(slowAmp > 0.98, s"passband attenuated: $slowAmp")
    assert(fastAmp < 1e-4, s"stopband leaked: $fastAmp")
    // zero phase: the filtered slow wave peaks where the input peaks (i=125
    // is a crest); a single forward pass would lag by several samples
    val crest = (120 to 130).maxBy(i => ySlow(i))
    assert(math.abs(crest - 125) <= 1, s"phase lag: crest at $crest")
    // and the single-pass filter does lag — the zero-phase property is real
    val zi = lfilterZi(c)
    val yFwd = lfilter(c, slow, zi.map(_ * slow(0)))
    val crestFwd = (120 to 145).maxBy(i => yFwd(i))
    assert(crestFwd > 126, s"forward pass should lag, crest at $crestFwd")
  }

  test("superposition: filtfilt is linear") {
    val c = lowpass(3, 0.15)
    val rnd = new scala.util.Random(42)
    val x1 = Array.fill(60)(rnd.nextDouble() * 10 - 5)
    val x2 = Array.fill(60)(rnd.nextDouble() * 4 - 2)
    val sum = x1.indices.map(i => 2.0 * x1(i) - 3.0 * x2(i)).toArray
    val lhs = filtfilt(c, sum)
    val y1 = filtfilt(c, x1); val y2 = filtfilt(c, x2)
    x1.indices.foreach { i =>
      assert(math.abs(lhs(i) - (2.0 * y1(i) - 3.0 * y2(i))) < 1e-9)
    }
  }

  test("butterLow auto-cadence matches explicit design at the median dt") {
    // 300 s cadence with jitter; lowpass = 1 day (the reference's default):
    // wn = 2*dt/(86400*lowpass)
    val rnd = new scala.util.Random(7)
    val n = 200
    val ts = new Array[Long](n); var t = 0L
    for (i <- 0 until n) { ts(i) = t; t += 300000000L + (rnd.nextInt(2001) - 1000).toLong * 1000L }
    val vals = Array.tabulate(n)(i => math.sin(2 * math.Pi * i / 50.0) + 0.2 * rnd.nextDouble())
    val auto = Butterworth.butterLow(ts, vals, lowpassDays = 1.0)
    // median dt is data-dependent; recompute it the same way for the check
    val diffs = (1 until n).map(i => (ts(i) - ts(i - 1)) / 1e6).sorted
    val m = diffs.length
    val dt = if (m % 2 == 1) diffs(m / 2) else (diffs(m / 2 - 1) + diffs(m / 2)) / 2.0
    val wn = (1.0 / 86400.0) / (1.0 / (2.0 * dt))
    val explicit = filtfilt(lowpass(3, wn), vals)
    auto.indices.foreach(i => assert(auto(i) == explicit(i)))
  }

  test("short series fall back to padlen = len-1 instead of raising") {
    val c = lowpass(3, 0.3)
    val x = Array(1.0, 2.0, 3.0, 2.0, 1.0)
    val y = filtfilt(c, x)
    assert(y.length == 5 && y.forall(v => !v.isNaN))
  }

  test("highpass: DC annihilated exactly, unit Nyquist gain, half-power at cutoff") {
    for (order <- Seq(1, 2, 3, 6); wn <- Seq(0.1, 0.3, 0.5, 0.8)) {
      val c = Butterworth.highpass(order, wn)
      // Σb = kz·(1-1)^N analytically; each kz·C(N,i) rounds separately, so
      // the cancellation leaves only ulp residue
      assert(math.abs(c.b.sum) < 1e-14 * c.b.map(math.abs).max,
        s"order=$order wn=$wn: b must sum to ~0 (zeros at z=1)")
      assert(math.abs(Butterworth.gainSq(c, math.Pi) - 1.0) < 1e-9,
        s"order=$order wn=$wn Nyquist gain")
      assert(math.abs(Butterworth.gainSq(c, math.Pi * wn) - 0.5) < 1e-9,
        s"order=$order wn=$wn half-power (prewarp pins the digital cutoff)")
      // maximally-flat magnitude is monotone for a highpass too
      var prev = 0.0
      for (k <- 1 to 50) {
        val g = Butterworth.gainSq(c, math.Pi * k / 50.0)
        assert(g >= prev - 1e-12); prev = g
      }
    }
  }

  test("highpass order 1 wn=0.5 has the closed-form coefficients [0.5,-0.5]/[1,0]") {
    val c = Butterworth.highpass(1, 0.5) // warped cutoff = fs2: z-pole at 0
    assert(math.abs(c.b(0) - 0.5) < 1e-15 && math.abs(c.b(1) + 0.5) < 1e-15)
    assert(c.a(0) == 1.0 && math.abs(c.a(1)) < 1e-15)
  }

  test("band split (butter filtlib.py:509-563): hp keeps the fast line, notide keeps the slow") {
    val n = 400
    val slow = Array.tabulate(n)(i => math.sin(2 * math.Pi * i / 200.0))
    val fast = Array.tabulate(n)(i => 0.5 * math.sin(2 * math.Pi * i / 8.0))
    val x = Array.tabulate(n)(i => slow(i) + fast(i))
    val tide = filtfilt(Butterworth.highpass(3, 0.1), x)   // passes 1/8 cycles
    val notide = Array.tabulate(n)(i => x(i) - tide(i))    // the reference's val_f_notide
    val denoised = filtfilt(lowpass(3, 0.5), tide)         // val_f_tide_denoise
    // compare away from the pad-influenced edges
    for (i <- 50 until n - 50) {
      assert(math.abs(tide(i) - fast(i)) < 0.05, s"tide[$i]")
      assert(math.abs(notide(i) - slow(i)) < 0.05, s"notide[$i]")
      assert(math.abs(denoised(i) - fast(i)) < 0.06, s"denoised[$i]")
    }
  }
}

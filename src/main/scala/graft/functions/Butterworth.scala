package graft.functions

/** 1-D Butterworth low-pass with zero-phase forward-backward application —
  * the engine form of `butter_low` (`filtlib.py:483-507`), which designs an
  * order-3 digital Butterworth from the series' median sampling interval and
  * applies scipy-style `filtfilt`.
  *
  * Everything here is textbook public DSP, re-derived:
  *  - analog prototype: N poles uniformly spaced on the left-half unit
  *    circle, `p_k = exp(i*pi*(2k+N-1)/(2N))` (Butterworth's defining
  *    maximally-flat construction);
  *  - frequency prewarp `w = 4*tan(pi*wn/2)` then the bilinear transform
  *    `z = (4+p)/(4-p)` (normalized fs=2 so `wn` is in Nyquist units, the
  *    scipy convention the reference passes `f_max/nyq` in);
  *  - zero-phase run: odd-extend by `padlen = 3*(order+1)`, filter forward
  *    with steady-state initial conditions scaled by the first sample,
  *    reverse, filter again, reverse, strip the padding.
  *
  * The defining analytic invariants are tested in ButterworthSpec: unit DC
  * gain, |H| = 1/sqrt(2) exactly at the prewarped cutoff, monotone
  * magnitude, -6N dB/octave rolloff, exact constancy on constant input
  * (which pins the steady-state init), and zero phase lag on sinusoids.
  *
  * The per-sample recursion (direct form II transposed) is a fixed chain of
  * IEEE double ops, so the q80 DuckDB oracle replays the identical chain in
  * a recursive CTE and hash-matches bit-for-bit.
  */
object Butterworth {

  /** Transfer-function coefficients, `a(0) == 1`. */
  final case class Coeffs(b: Array[Double], a: Array[Double]) extends Serializable

  /** Digital Butterworth lowpass. `wn` = cutoff / Nyquist, in (0, 1). */
  def lowpass(order: Int, wn: Double): Coeffs = design(order, wn, hp = false)

  /** Digital Butterworth HIGHpass (`butter(..., btype='highpass')`, the
    * tide-separation filter of `butter` filtlib.py:540-544). The lp2hp
    * transform `s -> warped/s` maps the unit-circle prototype poles to the
    * SAME pole set as the lowpass (conjugate reflection of a unit-modulus
    * set), moves the N zeros from z = -1 to z = +1 (so DC is annihilated
    * exactly: alternating binomial sums to 0), and changes the bilinear
    * gain from warped^N to fs2^N. */
  def highpass(order: Int, wn: Double): Coeffs = design(order, wn, hp = true)

  private def design(order: Int, wn: Double, hp: Boolean): Coeffs = {
    require(order >= 1, s"order must be >= 1, got $order")
    require(wn > 0.0 && wn < 1.0, s"wn must be in (0,1), got $wn")
    val fs2 = 4.0 // 2 * fs with the normalized design rate fs = 2
    val warped = fs2 * math.tan(math.Pi * wn / 2.0)
    // analog poles scaled to the warped cutoff (lp2lp), gain = warped^N
    val pr = new Array[Double](order); val pim = new Array[Double](order)
    var k = 0
    while (k < order) {
      val th = math.Pi * (2.0 * (k + 1) + order - 1.0) / (2.0 * order)
      pr(k) = warped * math.cos(th); pim(k) = warped * math.sin(th); k += 1
    }
    val gain = if (hp) math.pow(fs2, order) else math.pow(warped, order)
    // bilinear: digital pole z_k = (fs2 + p)/(fs2 - p); with no analog
    // zeros the digital gain is gain * Re(1 / prod(fs2 - p_k)), and the N
    // analog zeros at infinity land at z = -1.
    val zr = new Array[Double](order); val zim = new Array[Double](order)
    var prodR = 1.0; var prodI = 0.0
    k = 0
    while (k < order) {
      val dr = fs2 - pr(k); val di = -pim(k)
      val nr = fs2 + pr(k); val ni = pim(k)
      val dd = dr * dr + di * di
      zr(k) = (nr * dr + ni * di) / dd
      zim(k) = (ni * dr - nr * di) / dd
      val npr = prodR * dr - prodI * di
      val npi = prodR * di + prodI * dr
      prodR = npr; prodI = npi
      k += 1
    }
    val kz = gain * (prodR / (prodR * prodR + prodI * prodI))
    // b = kz * (z+1)^N lowpass / kz * (z-1)^N highpass (binomial, the hp
    // signs alternate), a = monic poly from the digital poles
    val b = new Array[Double](order + 1)
    b(0) = 1.0
    var i = 1
    while (i <= order) { b(i) = b(i - 1) * (order - i + 1).toDouble / i.toDouble; i += 1 }
    i = 0
    while (i <= order) {
      b(i) *= (if (hp && i % 2 == 1) -kz else kz)
      i += 1
    }
    Coeffs(b, polyFromComplexRoots(zr, zim))
  }

  /** Monic real polynomial (coefficients highest-power first) with the
    * given conjugate-closed complex root set: repeated in-place
    * multiplication by (x - r_k), updating from the tail so each step
    * reads the not-yet-updated lower index. Imaginary residue (~1 ulp,
    * conjugate symmetry) is discarded. */
  private def polyFromComplexRoots(re: Array[Double], im: Array[Double]): Array[Double] = {
    val n = re.length
    val cr = new Array[Double](n + 1); val ci = new Array[Double](n + 1)
    cr(0) = 1.0
    var k = 0
    while (k < n) {
      var j = k + 1
      while (j >= 1) {
        cr(j) -= cr(j - 1) * re(k) - ci(j - 1) * im(k)
        ci(j) -= cr(j - 1) * im(k) + ci(j - 1) * re(k)
        j -= 1
      }
      k += 1
    }
    cr
  }

  /** Squared magnitude response |H(e^{jw})|^2 at angular frequency w. */
  def gainSq(c: Coeffs, w: Double): Double = {
    def evalSq(p: Array[Double]): Double = {
      var re = 0.0; var im = 0.0; var i = 0
      while (i < p.length) { re += p(i) * math.cos(-w * i); im += p(i) * math.sin(-w * i); i += 1 }
      re * re + im * im
    }
    evalSq(c.b) / evalSq(c.a)
  }

  /** Steady-state initial filter state for a unit-amplitude step — the
    * standard companion-matrix solve `(I - A^T) zi = b[1:] - a[1:] b0`,
    * so that filtering a constant c with state `zi * c` returns exactly c. */
  def lfilterZi(c: Coeffs): Array[Double] = {
    val m = c.a.length - 1
    val mat = Array.ofDim[Double](m, m)
    val rhs = new Array[Double](m)
    var i = 0
    while (i < m) {
      mat(i)(0) = (if (i == 0) 1.0 else 0.0) + c.a(i + 1)
      if (i > 0) mat(i)(i) += 1.0
      if (i + 1 < m) mat(i)(i + 1) -= 1.0
      rhs(i) = c.b(i + 1) - c.a(i + 1) * c.b(0)
      i += 1
    }
    solve(mat, rhs)
  }

  /** Gaussian elimination with partial pivoting (m <= order, tiny). */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val m = b.length
    var col = 0
    while (col < m) {
      var piv = col; var r = col + 1
      while (r < m) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      if (piv != col) { val t = a(piv); a(piv) = a(col); a(col) = t
        val tb = b(piv); b(piv) = b(col); b(col) = tb }
      require(a(col)(col) != 0.0, "singular zi system")
      r = col + 1
      while (r < m) {
        val f = a(r)(col) / a(col)(col)
        var j2 = col
        while (j2 < m) { a(r)(j2) -= f * a(col)(j2); j2 += 1 }
        b(r) -= f * b(col)
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](m)
    var i = m - 1
    while (i >= 0) {
      var s = b(i); var j2 = i + 1
      while (j2 < m) { s -= a(i)(j2) * x(j2); j2 += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }

  /** Direct-form-II-transposed linear filter with initial state `zi`.
    * The per-sample chain (`y = b0*x + z1`; `z_i = b_{i+1}*x - a_{i+1}*y
    * + z_{i+2}`) is what the q80 oracle replays verbatim. */
  def lfilter(c: Coeffs, x: Array[Double], zi: Array[Double]): Array[Double] = {
    val b = c.b; val a = c.a; val m = a.length - 1
    val z = java.util.Arrays.copyOf(zi, m)
    val y = new Array[Double](x.length)
    var n = 0
    while (n < x.length) {
      val xn = x(n)
      val yn = b(0) * xn + z(0)
      var i = 0
      while (i < m - 1) { z(i) = b(i + 1) * xn - a(i + 1) * yn + z(i + 1); i += 1 }
      z(m - 1) = b(m) * xn - a(m) * yn
      y(n) = yn
      n += 1
    }
    y
  }

  /** Zero-phase forward-backward filter, scipy-compatible defaults: odd
    * extension of `padlen = 3 * (order+1)` samples (clamped to len-1 on
    * short series, where the reference's scipy call would raise), initial
    * state `zi * first-sample` on each pass. */
  def filtfilt(c: Coeffs, x: Array[Double]): Array[Double] = {
    require(x.length >= 2, "filtfilt needs at least 2 samples")
    val ntaps = math.max(c.a.length, c.b.length)
    val padlen = math.min(3 * ntaps, x.length - 1)
    val len = x.length
    val total = len + 2 * padlen
    val ext = new Array[Double](total)
    var j = 0
    while (j < padlen) { ext(j) = 2.0 * x(0) - x(padlen - j); j += 1 }
    System.arraycopy(x, 0, ext, padlen, len)
    j = 0
    while (j < padlen) { ext(padlen + len + j) = 2.0 * x(len - 1) - x(len - 2 - j); j += 1 }
    val zi = lfilterZi(c)
    val y1 = lfilter(c, ext, zi.map(_ * ext(0)))
    val r1 = new Array[Double](total)
    j = 0
    while (j < total) { r1(j) = y1(total - 1 - j); j += 1 }
    val y2 = lfilter(c, r1, zi.map(_ * r1(0)))
    val out = new Array[Double](len)
    var n = 0
    while (n < len) { out(n) = y2(total - 1 - padlen - n); n += 1 }
    out
  }

  /** The reference's auto-cadence form (`butter_low` filtlib.py:483-507):
    * sampling interval = median of successive timestamp gaps, cutoff
    * `1/(86400*lowpassDays)` Hz over Nyquist. Timestamps in microseconds. */
  def butterLow(tsUs: Array[Long], vals: Array[Double], lowpassDays: Double,
                order: Int = 3): Array[Double] = {
    require(tsUs.length == vals.length && tsUs.length >= 3, "need >= 3 samples")
    val diffs = new Array[Double](tsUs.length - 1)
    var i = 0
    while (i < diffs.length) { diffs(i) = (tsUs(i + 1) - tsUs(i)) / 1e6; i += 1 }
    java.util.Arrays.sort(diffs)
    val m = diffs.length
    val dtS = if (m % 2 == 1) diffs(m / 2) else (diffs(m / 2 - 1) + diffs(m / 2)) / 2.0
    require(dtS > 0.0, "non-increasing timestamps")
    val nyq = 1.0 / (2.0 * dtS)
    val wn = (1.0 / (86400.0 * lowpassDays)) / nyq
    require(wn < 1.0, s"cutoff above Nyquist (wn=$wn): lowpassDays too small for cadence $dtS s")
    filtfilt(lowpass(order, wn), vals)
  }
}

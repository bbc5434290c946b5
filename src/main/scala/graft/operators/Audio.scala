package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.{AudioRow, AudioTable}

/** Audio-column operators — the audio leg of the multimodal pipeline. The
  * binary PCM payload stays opaque through shuffles and is decoded only
  * inside typed per-partition stages, the same contract as Multimodal's
  * image stages. Decode here is REAL (PCM16-LE), not stubbed.
  *
  * Scale shape: every operator is a narrow map over clips — no shuffle at
  * all. At 100 TB the cost is one decode + O(N) or O(N log N) arithmetic
  * per row, embarrassingly parallel; partition sizing is governed purely by
  * `spark.sql.files.maxPartitionBytes` on the payload column. */
object Audio {

  /** Time-domain features. Every emitted value is a fixed chain of
    * correctly-rounded IEEE ops on EXACT integer accumulators (s ≤ 2¹⁵,
    * s² ≤ 2³⁰, Σ over 2¹⁰ samples ≤ 2⁴⁰ — inside double's 53 bits), so the
    * DuckDB twin (q83) replays them bit-for-bit: peak |s|, zero-crossing
    * count (sign products), mean = Σs/n, rms = √(Σs²/n). */
  def features(spark: SparkSession, clips: DataFrame): DataFrame = {
    import spark.implicits._
    clips.as[AudioRow].map { clip =>
      val s = AudioTable.decodePcm16(clip.bytes)
      var peak = 0L; var sum = 0L; var sumsq = 0L; var zc = 0L
      var i = 0
      while (i < s.length) {
        val v = s(i).toLong
        if (math.abs(v) > peak) peak = math.abs(v)
        sum += v; sumsq += v * v
        if (i > 0 && s(i - 1).toLong * v < 0) zc += 1
        i += 1
      }
      val n = s.length
      (clip.audio_id, clip.sr, n, peak,
       sum.toDouble / n, math.sqrt(sumsq.toDouble / n), zc)
    }.toDF("audio_id", "sr", "n_samples", "peak", "mean", "rms", "zero_crossings")
  }

  /** Goertzel single-bin DFT power at fixed bins `ks` — the streaming-friendly
    * spectral probe (O(N) per bin, no FFT buffer). The recursion
    * s0 = x[t] + c·s1 − s2 is a fixed chain of IEEE double ops, replayed
    * bit-for-bit by a DuckDB recursive CTE (q84, same technique as the q80
    * Butterworth filtfilt twin). Coefficients c = 2·cos(2πk/N) are computed
    * HERE once and embedded in the twin as correctly-rounded string-cast
    * literals, so the two engines share identical constants. */
  def goertzelCoeff(k: Int, n: Int): Double =
    2.0 * math.cos(2.0 * math.Pi * k / n)

  def goertzel(spark: SparkSession, clips: DataFrame, ks: Seq[Int]): DataFrame = {
    import spark.implicits._
    val kArr = ks.toArray
    clips.as[AudioRow].flatMap { clip =>
      val s = AudioTable.decodePcm16(clip.bytes)
      kArr.iterator.map { k =>
        val c = goertzelCoeff(k, s.length)
        var s1 = 0.0; var s2 = 0.0
        var t = 0
        while (t < s.length) {
          val s0 = s(t) + c * s1 - s2
          s2 = s1; s1 = s0
          t += 1
        }
        val power = s1 * s1 + s2 * s2 - c * s1 * s2
        (clip.audio_id, k, power)
      }
    }.toDF("audio_id", "k", "power")
  }

  /** In-place iterative radix-2 FFT (textbook Cooley–Tukey, public
    * algorithm): re/im arrays, bit-reversal permutation then log₂N butterfly
    * stages. Used by `dominantBin`; FFTSpec proves it against the naive
    * O(N²) DFT and Parseval's theorem. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, s"FFT size must be a power of 2, got $n")
    // bit-reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0; var ci = 0.0
        var p = 0
        while (p < len / 2) {
          val a = blk + p; val b = a + len / 2
          val xr = re(b) * cr - im(b) * ci
          val xi = re(b) * ci + im(b) * cr
          re(b) = re(a) - xr; im(b) = im(a) - xi
          re(a) += xr; im(a) += xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          p += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** Dominant spectral bin per clip (argmax of |X[k]|² over 1 ≤ k < N/2,
    * lowest k on ties). Emitting the integer bin — not the float magnitude —
    * is what makes the cross-engine twin (q85, naive-DFT argmax in DuckDB)
    * robust: the synthetic clips' leakage peaks are isolated, so a ≤1-ulp
    * transcendental difference between engines cannot move the argmax, while
    * raw FFT magnitudes would differ (butterfly vs naive summation order). */
  def dominantBin(spark: SparkSession, clips: DataFrame): DataFrame = {
    import spark.implicits._
    clips.as[AudioRow].map { clip =>
      val s = AudioTable.decodePcm16(clip.bytes)
      val re = s.map(_.toDouble); val im = new Array[Double](s.length)
      fft(re, im)
      var best = 1; var bestMag = 0.0
      var k = 1
      while (k < s.length / 2) {
        val m = re(k) * re(k) + im(k) * im(k)
        if (m > bestMag) { bestMag = m; best = k }
        k += 1
      }
      (clip.audio_id, best)
    }.toDF("audio_id", "dom_bin")
  }
}

package graft.functions

/** Student-t distribution helpers — the scipy.stats.t.ppf analog the trend
  * significance mask needs (`ma_linreg` conf_test, `malib.py:1146-1156`).
  * Built from textbook-public algorithms: Lanczos log-gamma, the Lentz
  * continued fraction for the regularized incomplete beta (the standard
  * numerical form), and bisection inversion for the quantile. */
object TDist {
  def logGamma(x: Double): Double = {
    val c = Array(0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5) math.log(math.Pi / math.sin(math.Pi * x)) - logGamma(1 - x)
    else {
      val xx = x - 1
      var a = c(0)
      val t = xx + 7.5
      var i = 1
      while (i < 9) { a += c(i) / (xx + i); i += 1 }
      0.5 * math.log(2 * math.Pi) + (xx + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Continued fraction for the incomplete beta (modified Lentz). */
  private def betacf(a: Double, b: Double, x: Double): Double = {
    val eps = 1e-15; val fpmin = 1e-300
    val qab = a + b; val qap = a + 1; val qam = a - 1
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < fpmin) d = fpmin
    d = 1.0 / d
    var h = d
    var m = 1
    var converged = false
    while (m <= 200 && !converged) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < eps) converged = true
      m += 1
    }
    h
  }

  /** Regularized incomplete beta I_x(a, b). */
  def incBeta(a: Double, b: Double, x: Double): Double = {
    if (x <= 0) 0.0
    else if (x >= 1) 1.0
    else {
      val bt = math.exp(logGamma(a + b) - logGamma(a) - logGamma(b) +
        a * math.log(x) + b * math.log(1 - x))
      if (x < (a + 1) / (a + b + 2)) bt * betacf(a, b, x) / a
      else 1.0 - bt * betacf(b, a, 1 - x) / b
    }
  }

  /** CDF of Student's t with `df` degrees of freedom. */
  def cdf(t: Double, df: Double): Double = {
    val p = 0.5 * incBeta(df / 2.0, 0.5, df / (df + t * t))
    if (t >= 0) 1.0 - p else p
  }

  /** Quantile (inverse CDF) via bisection; p in (0, 1). */
  def ppf(p: Double, df: Double): Double = {
    require(p > 0 && p < 1 && df > 0)
    var lo = -1e3; var hi = 1e3
    var i = 0
    while (i < 200 && hi - lo > 1e-10 * math.max(1.0, math.abs(lo))) {
      val mid = 0.5 * (lo + hi)
      if (cdf(mid, df) < p) lo = mid else hi = mid
      i += 1
    }
    0.5 * (lo + hi)
  }

  /** Two-sided critical value t_{α/2, df} (scipy `abs(t.ppf(alpha/2, df))`,
    * `malib.py:1152`). */
  def crit(alpha: Double, df: Double): Double = math.abs(ppf(alpha / 2.0, df))
}

package graft.functions

/** Distribution functions from the reference's math library
  * (`core/trino-main/.../operator/scalar/MathFunctions.java`:
  * normal_cdf, inverse_normal_cdf, beta_cdf, inverse_beta_cdf) —
  * implemented from the standard published algorithms: regularized
  * incomplete gamma/beta (series + Lentz continued fraction,
  * Abramowitz & Stegun §6.5/§26.5) and Acklam's rational
  * approximation for the normal quantile, refined with one Halley
  * step to machine precision.
  *
  * Pure double→double functions: registered as session UDFs (low
  * call-volume analytics scalars, not 100 TB hot-path — anything that
  * would sit under a corpus-wide scan belongs in a native Expression
  * like CosineSimilarity instead).
  */
object StatFunctions {

  private val Sqrt2 = math.sqrt(2.0)

  /** ln Γ(x), Lanczos approximation (|ε| < 2e-10, x > 0). */
  def gammln(x: Double): Double = {
    val cof = Array(76.18009172947146, -86.50532032941677, 24.01409824083091,
      -1.231739572450155, 0.1208650973866179e-2, -0.5395239384953e-5)
    val y0 = x
    var y = x
    val tmp0 = x + 5.5
    val tmp = tmp0 - (x + 0.5) * math.log(tmp0)
    var ser = 1.000000000190015
    var j = 0
    while (j < 6) { y += 1.0; ser += cof(j) / y; j += 1 }
    -tmp + math.log(2.5066282746310005 * ser / y0)
  }

  /** Regularized lower incomplete gamma P(a, x). */
  def gammp(a: Double, x: Double): Double = {
    require(a > 0 && x >= 0, s"gammp domain: a=$a x=$x")
    if (x == 0) 0.0
    else if (x < a + 1.0) { // series representation
      var ap = a
      var sum = 1.0 / a
      var del = sum
      var n = 0
      while (n < 500 && math.abs(del) >= math.abs(sum) * 1e-16) {
        ap += 1.0; del *= x / ap; sum += del; n += 1
      }
      sum * math.exp(-x + a * math.log(x) - gammln(a))
    } else { // continued fraction for Q, P = 1 - Q
      val fpmin = 1e-300
      var b = x + 1.0 - a
      var c = 1.0 / fpmin
      var d = 1.0 / b
      var h = d
      var i = 1
      var del = 0.0
      do {
        val an = -i * (i - a)
        b += 2.0
        d = an * d + b; if (math.abs(d) < fpmin) d = fpmin
        c = b + an / c; if (math.abs(c) < fpmin) c = fpmin
        d = 1.0 / d
        del = d * c
        h *= del
        i += 1
      } while (i < 500 && math.abs(del - 1.0) >= 1e-16)
      1.0 - math.exp(-x + a * math.log(x) - gammln(a)) * h
    }
  }

  /** Error function via the incomplete gamma: erf(x) = P(1/2, x²). */
  def erf(x: Double): Double =
    if (x < 0) -gammp(0.5, x * x) else gammp(0.5, x * x)

  /** Φ((x-mean)/sd): the reference's normal_cdf(mean, sd, value). */
  def normalCdf(mean: Double, sd: Double, x: Double): Double = {
    require(sd > 0, "standardDeviation must be > 0")
    // infinite x or mean saturate (reference TestMathFunctions
    // testNormalCdf: ±inf → 1/0); erf would return NaN on ±inf
    val z = (x - mean) / (sd * Sqrt2)
    if (z.isPosInfinity) 1.0
    else if (z.isNegInfinity) 0.0
    else 0.5 * (1.0 + erf(z))
  }

  /** Acklam's normal-quantile approximation + one Halley refinement. */
  def inverseNormalCdf(mean: Double, sd: Double, p: Double): Double = {
    require(sd > 0, "standardDeviation must be > 0")
    require(p > 0 && p < 1, "p must be in (0, 1)")
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pl = 0.02425
    var z =
      if (p < pl) {
        val q = math.sqrt(-2 * math.log(p))
        (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
      } else if (p <= 1 - pl) {
        val q = p - 0.5
        val r = q * q
        (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
          (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
      } else {
        val q = math.sqrt(-2 * math.log(1 - p))
        -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
      }
    // one Halley step against the exact CDF → ~machine precision
    val e = 0.5 * (1.0 + erf(z / Sqrt2)) - p
    val u = e * math.sqrt(2 * math.Pi) * math.exp(z * z / 2)
    z = z - u / (1 + z * u / 2)
    mean + sd * z
  }

  /** Regularized incomplete beta I_x(a, b) — Lentz continued fraction. */
  def betai(a: Double, b: Double, x: Double): Double = {
    require(a > 0 && b > 0, "alpha and beta must be > 0")
    require(x >= 0 && x <= 1, "value must be in [0, 1]")
    if (x == 0) return 0.0
    if (x == 1) return 1.0
    val bt = math.exp(gammln(a + b) - gammln(a) - gammln(b) +
      a * math.log(x) + b * math.log(1 - x))
    if (x < (a + 1) / (a + b + 2)) bt * betacf(a, b, x) / a
    else 1.0 - bt * betacf(b, a, 1 - x) / b
  }

  private def betacf(a: Double, b: Double, x: Double): Double = {
    val fpmin = 1e-300
    val qab = a + b
    val qap = a + 1.0
    val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < fpmin) d = fpmin
    d = 1.0 / d
    var h = d
    var m = 1
    var del = 0.0
    do {
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
      del = d * c
      h *= del
      m += 1
    } while (m < 500 && math.abs(del - 1.0) >= 1e-16)
    h
  }

  /** The reference's beta_cdf(alpha, beta, value). */
  def betaCdf(alpha: Double, beta: Double, x: Double): Double =
    betai(alpha, beta, x)

  /** The reference's inverse_beta_cdf(alpha, beta, p): Newton on the
    * regularized incomplete beta with bisection safeguarding. */
  def inverseBetaCdf(alpha: Double, beta: Double, p: Double): Double = {
    require(alpha > 0 && beta > 0, "alpha and beta must be > 0")
    require(p >= 0 && p <= 1, "p must be in [0, 1]")
    if (p == 0) return 0.0
    if (p == 1) return 1.0
    val lnB = gammln(alpha) + gammln(beta) - gammln(alpha + beta)
    var lo = 0.0
    var hi = 1.0
    var x = alpha / (alpha + beta) // mean as the starting point
    var i = 0
    var done = false
    while (i < 100 && !done) {
      val f = betai(alpha, beta, x) - p
      if (f > 0) hi = x else lo = x
      val pdf = math.exp((alpha - 1) * math.log(x) +
        (beta - 1) * math.log(1 - x) - lnB)
      var nx = if (pdf > 1e-300) x - f / pdf else Double.NaN
      if (nx.isNaN || nx <= lo || nx >= hi) nx = (lo + hi) / 2
      done = math.abs(nx - x) < 1e-15
      x = nx
      i += 1
    }
    x
  }
}

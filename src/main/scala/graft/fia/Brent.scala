package graft.fia

/** Brent's local minimizer (golden-section + successive parabolic
  * interpolation), the algorithm behind R's `stats::optimise` — a direct
  * implementation of Brent (1973) "Algorithms for Minimization without
  * Derivatives", as used by `findHT` (`R/predictCRM2.R:729-765`).
  * Default tolerance matches R: `.Machine$double.eps^0.25`.
  */
object Brent {

  val defaultTol: Double = math.pow(2.220446049250313e-16, 0.25)

  def minimize(f: Double => Double, lower: Double, upper: Double, tol: Double = defaultTol): Double = {
    val c = (3.0 - math.sqrt(5.0)) * 0.5 // golden ratio complement
    val eps = math.sqrt(2.220446049250313e-16)

    var a = lower
    var b = upper
    var x = a + c * (b - a)
    var w = x
    var v = w
    var d = 0.0
    var e = 0.0
    var fx = f(x)
    var fw = fx
    var fv = fx

    var tol1 = eps * math.abs(x) + tol / 3.0
    var tol2 = 2.0 * tol1
    var xm = (a + b) * 0.5

    while (math.abs(x - xm) > tol2 - (b - a) * 0.5) {
      var p = 0.0; var q = 0.0; var r = 0.0
      if (math.abs(e) > tol1) { // fit parabola
        r = (x - w) * (fx - fv)
        q = (x - v) * (fx - fw)
        p = (x - v) * q - (x - w) * r
        q = (q - r) * 2.0
        if (q > 0.0) p = -p else q = -q
        r = e
        e = d
      }
      if (math.abs(p) >= math.abs(q * 0.5 * r) || p <= q * (a - x) || p >= q * (b - x)) {
        // golden-section step
        e = if (x < xm) b - x else a - x
        d = c * e
      } else {
        // parabolic-interpolation step
        d = p / q
        val u0 = x + d
        if (u0 - a < tol2 || b - u0 < tol2) d = if (xm > x) tol1 else -tol1
      }
      // f must not be evaluated too close to x
      val u =
        if (math.abs(d) >= tol1) x + d
        else if (d > 0.0) x + tol1
        else x - tol1
      val fu = f(u)
      if (fu <= fx) {
        if (u < x) b = x else a = x
        v = w; fv = fw
        w = x; fw = fx
        x = u; fx = fu
      } else {
        if (u < x) a = u else b = u
        if (fu <= fw || w == x) {
          v = w; fv = fw
          w = u; fw = fu
        } else if (fu <= fv || v == x || v == w) {
          v = u; fv = fu
        }
      }
      tol1 = eps * math.abs(x) + tol / 3.0
      tol2 = 2.0 * tol1
      xm = (a + b) * 0.5
    }
    x
  }
}

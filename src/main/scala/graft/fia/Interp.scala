package graft.fia

/** Scalar interpolation kernels — exact ports of the reference semantics.
  *
  * `interExtraPolate` follows `R/inter_extra_polate.R:31-61`: linear
  * interpolation between non-missing anchors (R `stats::approx`), linear
  * extrapolation of gaps outside the anchor range from the two nearest
  * anchors (R `Hmisc::approxExtrap`), and carry-forward when only a single
  * anchor exists. One intentional divergence (documented in SURVEY.md
  * §7.4.4): the reference appends extrapolated values at the *end* of the
  * output regardless of where the missing positions were, which scrambles
  * ordering when leading values are missing; we place each value at its
  * own position.
  *
  * `stepInterp` follows `R/step_interp.R:16-48`: categorical values switch
  * at the midpoint between anchors — position p takes the previous anchor's
  * value iff `2*(p - prev) < next - prev` (equivalent to the reference's
  * floor/ceil rep-count construction), trailing positions repeat the last
  * anchor, leading positions stay missing.
  *
  * Floating-point note: every arithmetic step uses the same operation
  * order as the R source (`y1 + (y2-y1)*((x-x1)/(x2-x1))` for approx,
  * `y1 + ((x-x1)*(y2-y1))/(x2-x1)` for approxExtrap) so results are
  * bit-identical to any engine evaluating the same IEEE expressions.
  */
object Interp {

  /** For each position, index of the nearest non-missing position at or
    * before it (-1 if none). */
  private def prevAnchor(n: Int, present: Int => Boolean): Array[Int] = {
    val out = new Array[Int](n)
    var last = -1
    var i = 0
    while (i < n) { if (present(i)) last = i; out(i) = last; i += 1 }
    out
  }

  /** For each position, index of the nearest non-missing position at or
    * after it (-1 if none). */
  private def nextAnchor(n: Int, present: Int => Boolean): Array[Int] = {
    val out = new Array[Int](n)
    var nxt = -1
    var i = n - 1
    while (i >= 0) { if (present(i)) nxt = i; out(i) = nxt; i -= 1 }
    out
  }

  /** Linear interpolation + optional extrapolation.
    *
    * @param x ordered positions (years); strictly increasing
    * @param y values, Double.NaN marks missing
    * @return array of same length; NaN where a value cannot be produced
    */
  def interExtraPolate(x: Array[Int], y: Array[Double], extrapolate: Boolean = true): Array[Double] = {
    val n = x.length
    require(y.length == n, s"x/y length mismatch: $n vs ${y.length}")
    val present = (i: Int) => !y(i).isNaN
    val nAnchors = (0 until n).count(present)

    if (nAnchors < 2) {
      // R: fewer than two finite values -> return as-is (no extrapolation)
      // or carry the single value forward (fill direction "down").
      if (!extrapolate) return y.clone()
      val out = new Array[Double](n)
      var last = Double.NaN
      var i = 0
      while (i < n) { if (present(i)) last = y(i); out(i) = last; i += 1 }
      return out
    }

    val pa = prevAnchor(n, present)
    val na = nextAnchor(n, present)
    // second and second-to-last anchors, for extrapolation slopes
    val firstA = na(0)
    val lastA = pa(n - 1)
    val secondA = na(firstA + 1)
    val secondLastA = pa(lastA - 1)

    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (present(i)) y(i)
        else if (pa(i) < 0) {
          // leading gap — Hmisc::approxExtrap: y1 + ((x-x1)*(y2-y1))/(x2-x1)
          if (!extrapolate) Double.NaN
          else {
            val x1 = x(firstA); val x2 = x(secondA)
            val y1 = y(firstA); val y2 = y(secondA)
            y1 + ((x(i) - x1).toDouble * (y2 - y1)) / (x2 - x1).toDouble
          }
        } else if (na(i) < 0) {
          // trailing gap — Hmisc::approxExtrap: yn + ((x-xn)*(yn-yn1))/(xn-xn1)
          if (!extrapolate) Double.NaN
          else {
            val xn1 = x(secondLastA); val xn = x(lastA)
            val yn1 = y(secondLastA); val yn = y(lastA)
            yn + ((x(i) - xn).toDouble * (yn - yn1)) / (xn - xn1).toDouble
          }
        } else {
          // interior gap — stats::approx: y1 + (y2-y1)*((x-x1)/(x2-x1))
          val ia = pa(i); val ib = na(i)
          val x1 = x(ia); val x2 = x(ib)
          val y1 = y(ia); val y2 = y(ib)
          y1 + (y2 - y1) * ((x(i) - x1).toDouble / (x2 - x1).toDouble)
        }
      i += 1
    }
    out
  }

  /** Midpoint categorical switch over an ordered position axis.
    *
    * @param x ordered positions (years); strictly increasing
    * @param v values, null marks missing
    * @return array of same length; null where no value applies (leading)
    */
  def stepInterp[T >: Null <: AnyRef : scala.reflect.ClassTag](
      x: Array[Int], v: Array[T]): Array[T] = {
    val n = x.length
    require(v.length == n, s"x/v length mismatch: $n vs ${v.length}")
    val present = (i: Int) => v(i) != null
    // ClassTag-allocated: a bare new Array[AnyRef].asInstanceOf[Array[T]]
    // blows up with ClassCastException as soon as a caller binds T to a
    // concrete element type (e.g. Array[String]) and touches the result
    val out = new Array[T](n)
    if (!(0 until n).exists(present)) return out
    val pa = prevAnchor(n, present)
    val na = nextAnchor(n, present)
    var i = 0
    while (i < n) {
      out(i) =
        if (pa(i) < 0) null // leading positions stay missing
        else if (na(i) < 0) v(pa(i)) // trailing positions repeat last anchor
        else {
          val py = x(pa(i)); val ny = x(na(i))
          if (2 * (x(i) - py) < ny - py) v(pa(i)) else v(na(i))
        }
      i += 1
    }
    out
  }
}

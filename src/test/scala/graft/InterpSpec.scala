package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fia.Interp

/** Golden vectors ported verbatim from the reference tests
  * (`tests/testthat/test-inter_extra_polate.R:1-20`,
  * `tests/testthat/test-step_interp.R:1-7`). */
class InterpSpec extends AnyFunSuite {
  private val NaN = Double.NaN

  private def arr(xs: Double*): Array[Double] = xs.toArray

  private def assertSameVec(got: Array[Double], want: Array[Double]): Unit = {
    assert(got.length == want.length)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(
        (g.isNaN && w.isNaN) || g == w,
        s"at $i: got ${got.toSeq} want ${want.toSeq}")
    }
  }

  test("interp + extrap of c(2, NA, 5, 6, NA, NA, NA)") {
    val x = Array(1, 2, 3, 4, 5, 6, 7)
    val y = arr(2, NaN, 5, 6, NaN, NaN, NaN)
    assertSameVec(
      Interp.interExtraPolate(x, y, extrapolate = true),
      arr(2, 3.5, 5, 6, 7, 8, 9))
  }

  test("no-extrap variant leaves trailing NAs") {
    val x = Array(1, 2, 3, 4, 5, 6, 7)
    val y = arr(2, NaN, 5, 6, NaN, NaN, NaN)
    assertSameVec(
      Interp.interExtraPolate(x, y, extrapolate = false),
      arr(2, 3.5, 5, 6, NaN, NaN, NaN))
  }

  test("single anchor carries forward (not backward)") {
    val x = Array(1, 2, 3, 4, 5)
    val y = arr(NaN, NaN, 3, NaN, NaN)
    assertSameVec(
      Interp.interExtraPolate(x, y, extrapolate = true),
      arr(NaN, NaN, 3, 3, 3))
    assertSameVec(
      Interp.interExtraPolate(Array(1, 2, 3, 4), arr(5, NaN, NaN, NaN), extrapolate = true),
      arr(5, 5, 5, 5))
  }

  test("leading gap extrapolates position-correctly (documented divergence §7.4.4)") {
    val x = Array(1, 2, 3, 4)
    val y = arr(NaN, 4, 6, NaN)
    assertSameVec(
      Interp.interExtraPolate(x, y, extrapolate = true),
      arr(2, 4, 6, 8))
  }

  test("all-missing stays all-missing") {
    assertSameVec(
      Interp.interExtraPolate(Array(1, 2), arr(NaN, NaN), extrapolate = true),
      arr(NaN, NaN))
  }

  test("step_interp golden vector") {
    val v: Array[String] =
      Array(null, null, "A", null, null, null, "B", null, null, null, null, "C", null, null)
    val x = Array.tabulate(v.length)(_ + 1)
    val want: Array[String] =
      Array(null, null, "A", "A", "B", "B", "B", "B", "B", "C", "C", "C", "C", "C")
    assert(Interp.stepInterp(x, v).toSeq == want.toSeq)
  }

  test("step_interp with 13-length reference example") {
    // step_interp(c(NA, NA, "A", NA, NA, NA, "B", NA, NA, NA, NA, "C", NA))
    val v: Array[String] =
      Array(null, null, "A", null, null, null, "B", null, null, null, null, "C", null)
    val x = Array.tabulate(v.length)(_ + 1)
    val want: Array[String] =
      Array(null, null, "A", "A", "B", "B", "B", "B", "B", "C", "C", "C", "C")
    assert(Interp.stepInterp(x, v).toSeq == want.toSeq)
  }

  test("step_interp all-missing returns all-missing") {
    assert(Interp.stepInterp(Array(1, 2), Array[String](null, null)).toSeq == Seq(null, null))
  }

  test("interp anchors are preserved exactly (property)") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val n = 2 + rnd.nextInt(12)
      val x = Array.tabulate(n)(i => 2000 + i)
      val y = Array.tabulate(n)(_ => if (rnd.nextBoolean()) rnd.nextDouble() * 100 else NaN)
      val out = Interp.interExtraPolate(x, y, extrapolate = true)
      (0 until n).foreach { i =>
        if (!y(i).isNaN) assert(out(i) == y(i), s"anchor $i changed")
      }
      // monotone x between adjacent anchors => value between anchor values
      val anchors = (0 until n).filter(i => !y(i).isNaN)
      if (anchors.length >= 2) {
        anchors.sliding(2).foreach { case Seq(a, b) =>
          (a + 1 until b).foreach { i =>
            val lo = math.min(y(a), y(b)); val hi = math.max(y(a), y(b))
            assert(out(i) >= lo - 1e-9 && out(i) <= hi + 1e-9)
          }
        }
      }
    }
  }
}

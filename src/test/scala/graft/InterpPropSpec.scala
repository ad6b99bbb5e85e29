package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.fia.Interp

/** ScalaCheck properties for the interpolation kernels (SURVEY §5.1:
  * anchors preserved, output length, extrapolation coverage, midpoint
  * switch law). Uses the raw ScalaCheck runner (no scalatestplus
  * bridge in the offline dependency set). */
class InterpPropSpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(300)

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name: ${r.status}")
  }

  /** Panel generator: strictly increasing years + values with missing
    * (NaN) slots; at least one present value. */
  private val panelGen: Gen[(Array[Int], Array[Double])] = for {
    n <- Gen.choose(1, 24)
    x0 <- Gen.choose(1950, 2020)
    gaps <- Gen.listOfN(n, Gen.choose(1, 3))
    vals <- Gen.listOfN(n, Gen.oneOf(
      Gen.const(Double.NaN), Gen.choose(-1e3, 1e3).map(v => v)))
    anchor <- Gen.choose(0, n - 1)
    anchorVal <- Gen.choose(-1e3, 1e3)
  } yield {
    val xs = gaps.scanLeft(x0)(_ + _).tail.toArray
    val ys = vals.toArray
    ys(anchor) = anchorVal // guarantee >= 1 anchor
    (xs, ys)
  }

  test("linear: anchors bit-preserved, length kept, full coverage with >=2 anchors") {
    check("linear", Prop.forAll(panelGen) { case (xs, ys) =>
      val out = Interp.interExtraPolate(xs, ys, extrapolate = true)
      val nAnchors = ys.count(!_.isNaN)
      val lengthOk = out.length == xs.length
      val anchorsOk = xs.indices.forall(i => ys(i).isNaN || out(i) == ys(i))
      val coverageOk = nAnchors < 2 || out.forall(!_.isNaN)
      lengthOk && anchorsOk && coverageOk
    })
  }

  test("linear: interior gaps stay within the bracketing anchor interval") {
    check("interior-bounds", Prop.forAll(panelGen) { case (xs, ys) =>
      val out = Interp.interExtraPolate(xs, ys, extrapolate = true)
      val present = xs.indices.filter(i => !ys(i).isNaN)
      present.size < 2 || present.sliding(2).forall { w =>
        val (a, b) = (w(0), w(1))
        val lo = math.min(ys(a), ys(b)) - 1e-9
        val hi = math.max(ys(a), ys(b)) + 1e-9
        (a + 1 until b).forall(i => out(i) >= lo && out(i) <= hi)
      }
    })
  }

  test("linear: no-extrapolate leaves leading/trailing gaps missing") {
    check("no-extrap", Prop.forAll(panelGen) { case (xs, ys) =>
      val out = Interp.interExtraPolate(xs, ys, extrapolate = false)
      val present = xs.indices.filter(i => !ys(i).isNaN)
      val first = present.head; val last = present.last
      (0 until first).forall(out(_).isNaN) &&
        (last + 1 until xs.length).forall(out(_).isNaN)
    })
  }

  test("step: values come from anchors; midpoint-switch law holds") {
    // "" encodes missing — ScalaCheck's reporter can't pretty-print
    // nulls, so nulls only materialize inside the property body
    val stepGen: Gen[(Array[Int], Array[String])] = for {
      (xs, ys) <- panelGen
      labels <- Gen.listOfN(xs.length, Gen.oneOf("A", "B", "C"))
    } yield (xs, xs.indices.map(i => if (ys(i).isNaN) "" else labels(i)).toArray)

    check("step", Prop.forAll(stepGen) { case (xs, enc) =>
      val vs = enc.map(s => if (s.isEmpty) null else s)
      val out = Interp.stepInterp[String](xs, vs)
      val present = xs.indices.filter(vs(_) != null)
      val first = present.head
      val leadingOk = (0 until first).forall(out(_) == null)
      val anchorsOk = present.forall(i => out(i) == vs(i))
      val lawOk = xs.indices.forall { i =>
        if (vs(i) != null) true
        else {
          val prevs = present.filter(_ < i)
          val nexts = present.filter(_ > i)
          (prevs.isEmpty, nexts.isEmpty) match {
            case (true, _) => out(i) == null
            case (false, true) => out(i) == vs(prevs.last)
            case (false, false) =>
              val p = prevs.last; val nx = nexts.head
              val expect =
                if (2 * (xs(i) - xs(p)) < xs(nx) - xs(p)) vs(p) else vs(nx)
              out(i) == expect
          }
        }
      }
      leadingOk && anchorsOk && lawOk
    })
  }
}

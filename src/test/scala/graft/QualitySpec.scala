package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Quality

class QualitySpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  test("observed metrics ride the main action, no second scan") {
    import spark.implicits._
    val df = Seq(
      (1L, "a long enough document"),
      (2L, null.asInstanceOf[String]),
      (3L, "ok"),
      (4L, "another long document")).toDF("id", "text")

    val (out, obs) = Quality.observed(df, "curate",
      Quality.rowCount, Quality.nullCount("text"), Quality.belowLength("text", 5))
    val n = out.filter($"id" > 0).count()

    assert(n == 4)
    val m = obs.get
    assert(m("n_rows") == 4L)
    assert(m("n_null_text") == 1L)
    // null text is not < 5 chars (length(null) = null), so only "ok"
    assert(m("n_short_text") == 1L)
  }
}

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

  test("profileNumeric: exact stats, no Expand fan-out, column-pruned branches") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10.0)), (2L, Some(10.0)), (3L, None), (4L, Some(-2.5)))
      .toDF("id", "x")
    val prof = Quality.profileNumeric(df, Seq("id", "x"))
    // two-level per-column aggregation: the old combined multi-distinct
    // planned through Expand, which fanned every row to (N cols + 1)
    // copies before the partial aggregate — 41 s warm at the 100× tier.
    // The union of per-column branches must NOT Expand, and each branch
    // reads exactly one column (columnar parquet: N one-column scans ==
    // one N-column scan in bytes)
    val plan = prof.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"profile must not Expand the scan:\n$plan")
    assert("LocalTableScan|Scan parquet".r.findAllIn(plan).length <= 2,
      s"one branch (and one scan) per column, no more:\n$plan")
    val rows = prof.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(rows("id") == ((4L, 0L, 4L, 1.0, 4.0, 10.0)))
    assert(rows("x") == ((3L, 1L, 2L, -2.5, 10.0, 17.5)))
  }
}

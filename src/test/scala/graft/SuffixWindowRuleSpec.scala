package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.plans.RewriteSuffixWindowFrames: the naive suffix-frame shape
  * (`ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING`) — quadratic
  * per partition in Spark's evaluator — must plan as a RUNNING frame
  * over the reversed order, with identical values. */
class SuffixWindowRuleSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  private def fixture = {
    import spark.implicits._
    Seq(
      ("a", 1, Option.empty[Int]), ("a", 2, Some(20)), ("a", 3, None),
      ("a", 4, Some(40)), ("b", 1, None), ("b", 2, None), ("b", 3, Some(9)))
      .toDF("k", "t", "v")
  }

  test("first(ignoreNulls) over a suffix frame plans as a running frame, values exact") {
    val w = Window.partitionBy("k").orderBy("t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val out = fixture.withColumn("f", first(col("v"), ignoreNulls = true).over(w))

    val optimized = out.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("unboundedfollowing$"),
      s"suffix frame survived optimization:\n$optimized")
    assert(optimized.contains("unboundedpreceding$"),
      s"expected the running-frame rewrite:\n$optimized")

    // fill-up semantics, hand-computed
    val got = out.orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(3)) None else Some(r.getInt(3))))
    assert(got.toSeq == Seq(
      ("a", 1, Some(20)), ("a", 2, Some(20)), ("a", 3, Some(40)),
      ("a", 4, Some(40)), ("b", 1, Some(9)), ("b", 2, Some(9)),
      ("b", 3, Some(9))))
  }

  test("order-insensitive aggregates over a suffix frame rewrite too (min over suffix)") {
    val w = Window.partitionBy("k").orderBy("t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val out = fixture.withColumn("m", min(col("v")).over(w))
      .withColumn("n", count(lit(1)).over(w))
    val optimized = out.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("unboundedfollowing$"), optimized)
    val got = out.orderBy("k", "t")
      .select("k", "t", "m", "n").collect()
      .map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("a", 1, 20, 4L), ("a", 2, 20, 3L), ("a", 3, 40, 2L), ("a", 4, 40, 1L),
      ("b", 1, 9, 3L), ("b", 2, 9, 2L), ("b", 3, 9, 1L)))
  }

  test("offset suffix frames flip too (ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)") {
    val w = Window.partitionBy("k").orderBy("t")
      .rowsBetween(1, Window.unboundedFollowing)
    val out = fixture
      .withColumn("m", min(col("v")).over(w))
      .withColumn("f", first(col("v"), ignoreNulls = true).over(w))
      .withColumn("n", count(lit(1)).over(w))
    val optimized = out.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("unboundedfollowing$"),
      s"offset suffix frame survived optimization:\n$optimized")
    // frame EXCLUDES the current row; at each partition's last row it
    // is empty (null aggregates, count 0) — same set either direction
    val got = out.orderBy("k", "t").collect().map(r => (
      r.getString(0), r.getInt(1),
      if (r.isNullAt(3)) -1 else r.getInt(3),
      if (r.isNullAt(4)) -1 else r.getInt(4),
      r.getLong(5)))
    assert(got.toSeq == Seq(
      ("a", 1, 20, 20, 3L), ("a", 2, 40, 40, 2L), ("a", 3, 40, 40, 1L),
      ("a", 4, -1, -1, 0L),
      ("b", 1, 9, 9, 2L), ("b", 2, 9, 9, 1L), ("b", 3, -1, -1, 0L)))
  }

  test("no-offset RANGE suffix frames flip; peer ties included on both sides") {
    import spark.implicits._
    val df = Seq(("a", 1, 10), ("a", 2, 20), ("a", 2, 21), ("a", 3, 30))
      .toDF("k", "t", "v")
    val w = Window.partitionBy("k").orderBy("t")
      .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    val out = df.withColumn("m", min(col("v")).over(w))
      .withColumn("n", count(lit(1)).over(w))
    val optimized = out.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("unboundedfollowing$"),
      s"range suffix frame survived optimization:\n$optimized")
    val got = out.orderBy("t", "v").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    // at t=2 the frame starts at the FIRST t=2 peer for both peers
    assert(got.toSeq == Seq(
      (1, 10, 10, 4L), (2, 20, 20, 3L), (2, 21, 20, 3L), (3, 30, 30, 1L)))
  }

  test("offset RANGE suffix frames keep their frame (value bounds do not reverse)") {
    val w = Window.partitionBy("k").orderBy("t")
      .rangeBetween(1, Window.unboundedFollowing)
    val out = fixture.withColumn("m", min(col("v")).over(w))
    assert(out.queryExecution.optimizedPlan.toString.contains("unboundedfollowing$"),
      "offset range frame must not rewrite")
  }

  test("a node with a non-rewritable expression is left as written") {
    val w = Window.partitionBy("k").orderBy("t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // collect_list over a suffix frame is ORDER-SENSITIVE: reversing
    // the sort would reverse the list — must NOT rewrite
    val out = fixture.withColumn("l", collect_list(col("v")).over(w))
    val optimized = out.queryExecution.optimizedPlan.toString
    assert(optimized.contains("unboundedfollowing$"),
      s"order-sensitive aggregate must keep its frame:\n$optimized")
    val got = out.filter(col("k") === "a" && col("t") === 1)
      .select("l").collect()(0).getSeq[Int](0)
    assert(got == Seq(20, 40), "suffix collect_list order preserved")
  }

  test("a MIXED node splits: eligible half runs linear, the rest keeps its frame") {
    val w = Window.partitionBy("k").orderBy("t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // first() is eligible; collect_list is order-sensitive and must
    // keep the written (quadratic) frame — pre-split it poisoned the
    // whole node
    val out = fixture
      .withColumn("f", first(col("v"), ignoreNulls = true).over(w))
      .withColumn("l", collect_list(col("v")).over(w))
    val optimized = out.queryExecution.optimizedPlan.toString
    assert(optimized.contains("unboundedpreceding$"),
      s"eligible expression must run linear after the split:\n$optimized")
    assert(optimized.contains("unboundedfollowing$"),
      s"order-sensitive expression must keep its frame:\n$optimized")
    // values of BOTH halves, and the output column order, unchanged
    assert(out.columns.toSeq == Seq("k", "t", "v", "f", "l"))
    val got = out.orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(3)) -1 else r.getInt(3), r.getSeq[Int](4).toList))
    assert(got.toSeq == Seq(
      ("a", 1, 20, List(20, 40)), ("a", 2, 20, List(20, 40)),
      ("a", 3, 40, List(40)), ("a", 4, 40, List(40)),
      ("b", 1, 9, List(9)), ("b", 2, 9, List(9)), ("b", 3, 9, List(9))))
  }

  test("floating-point sum keeps its frame; integral sum flips") {
    import spark.implicits._
    val df = Seq(("a", 1, 1L, 0.1), ("a", 2, 2L, 0.2), ("a", 3, 3L, 0.3))
      .toDF("k", "t", "i", "d")
    val w = Window.partitionBy("k").orderBy("t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // double sum: reversed accumulation can change low-order bits —
    // must NOT rewrite (bit-exactness beats the linear frame)
    val fp = df.withColumn("s", sum(col("d")).over(w))
    assert(fp.queryExecution.optimizedPlan.toString.contains("unboundedfollowing$"),
      "FP suffix sum must keep its written frame")
    // integral sum is exact in any order — rewrites and stays exact
    val int = df.withColumn("s", sum(col("i")).over(w))
    val iopt = int.queryExecution.optimizedPlan.toString
    assert(!iopt.contains("unboundedfollowing$") && iopt.contains("unboundedpreceding$"))
    assert(int.orderBy("t").select("s").collect().map(_.getLong(0)).toSeq ==
      Seq(6L, 5L, 3L))
  }

  test("avg keeps its frame on non-decimal inputs; flips on decimal") {
    import spark.implicits._
    val df = Seq(("a", 1, 1L), ("a", 2, 2L), ("a", 3, 3L))
      .toDF("k", "t", "i")
      .withColumn("dec", col("i").cast("decimal(20,2)"))
    val w = Window.partitionBy("k").orderBy("t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // long avg: Spark's Average keeps a DOUBLE sum buffer for every
    // non-decimal input, so reordering drifts past 2^53 of partial
    // sum — must NOT rewrite
    val lng = df.withColumn("a", avg(col("i")).over(w))
    assert(lng.queryExecution.optimizedPlan.toString.contains("unboundedfollowing$"),
      "non-decimal suffix avg must keep its written frame")
    // decimal avg: decimal sum buffer, order-exact — rewrites
    val dec = df.withColumn("a", avg(col("dec")).over(w))
    val dopt = dec.queryExecution.optimizedPlan.toString
    assert(!dopt.contains("unboundedfollowing$") && dopt.contains("unboundedpreceding$"),
      s"decimal suffix avg must flip:\n$dopt")
    assert(dec.orderBy("t").select("a").collect()
      .map(_.getDecimal(0).doubleValue).toSeq == Seq(2.0, 2.5, 3.0))
  }

  test("SQL-text queries get the rewrite as well") {
    fixture.createOrReplaceTempView("sfx_t")
    val out = spark.sql(
      """SELECT k, t, first(v, true) OVER (
        |  PARTITION BY k ORDER BY t
        |  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f
        |FROM sfx_t""".stripMargin)
    assert(!out.queryExecution.optimizedPlan.toString.contains("unboundedfollowing$"))
    assert(out.filter(col("k") === "b" && col("t") === 1)
      .select("f").collect()(0).getInt(0) == 9)
  }
}

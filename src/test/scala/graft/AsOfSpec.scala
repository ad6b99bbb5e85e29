package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsOf

class AsOfSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  test("joinAsOf: greatest right time at-or-before, inclusive boundary, null before first") {
    import spark.implicits._
    val left = Seq(
      (1L, "a", 5L),   // before any quote -> null
      (2L, "a", 10L),  // == quote time: INCLUSIVE -> 100.0
      (3L, "a", 19L),  // between quotes -> 100.0
      (4L, "a", 20L),  // == second quote -> 200.0
      (5L, "a", 99L),  // after last -> 200.0
      (6L, "b", 50L)   // key with no quotes at all -> null
    ).toDF("id", "k", "t")
    val right = Seq(("a", 10L, 100.0), ("a", 20L, 200.0)).toDF("k", "qt", "px")
    val got = AsOf.joinAsOf(left, right, Seq("k"), "t", "qt", Seq("px"))
      .select($"id", $"px_asof").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == Map(
      1L -> None, 2L -> Some(100.0), 3L -> Some(100.0),
      4L -> Some(200.0), 5L -> Some(200.0), 6L -> None))
  }

  test("joinAsOf matches a naive per-row max-time lookup on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val left = (0 until 500).map(i =>
      (i.toLong, s"k${i % 7}", rnd.nextInt(10000).toLong)).toDF("id", "k", "t")
    val rightRows = (0 until 200).map(j =>
      (s"k${j % 7}", rnd.nextInt(10000).toLong, j.toDouble))
      .groupBy(r => (r._1, r._2)).map(_._2.minBy(_._3)).toSeq // unique (k, t)
    val right = rightRows.toDF("k", "qt", "v")
    val got = AsOf.joinAsOf(left, right, Seq("k"), "t", "qt", Seq("v"))
      .select($"id", $"v_asof").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    val byKey = rightRows.groupBy(_._1)
    val want = left.collect().map { r =>
      val (id, k, t) = (r.getLong(0), r.getString(1), r.getLong(2))
      val best = byKey.getOrElse(k, Seq.empty).filter(_._2 <= t)
        .sortBy(q => (q._2, q._3)).lastOption.map(_._3)
      id -> best
    }.toMap
    assert(got == want)
  }

  test("joinAsOf: a matched right row's NULL value stays NULL (no leak-forward), " +
    "and all value cols come from the same right row") {
    import spark.implicits._
    val left = Seq(
      (1L, "a", 15L), // after (10, px=100, sz=7)        -> (100, 7)
      (2L, "a", 25L), // after (20, px=NULL, sz=9)       -> (NULL, 9): px must NOT leak 100
      (3L, "a", 35L)  // after (30, px=300, sz=NULL)     -> (300, NULL): sz must NOT leak 9
    ).toDF("id", "k", "t")
    val right = Seq(
      ("a", 10L, Some(100.0), Some(7L)),
      ("a", 20L, None, Some(9L)),
      ("a", 30L, Some(300.0), None)
    ).toDF("k", "qt", "px", "sz")
    val got = AsOf.joinAsOf(left, right, Seq("k"), "t", "qt", Seq("px", "sz"))
      .select($"id", $"px_asof", $"sz_asof").collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(got == Map(
      1L -> ((Some(100.0), Some(7L))),
      2L -> ((None, Some(9L))),
      3L -> ((Some(300.0), None))))
  }

  test("joinAsOf tolerance: stale matches yield null, fresh ones attach") {
    import spark.implicits._
    val left = Seq(
      (1L, "a", 15L), // match at 10, staleness 5  <= 10 -> attaches
      (2L, "a", 25L), // match at 10, staleness 15 > 10  -> null
      (3L, "a", 5L)   // no match at all                 -> null
    ).toDF("id", "k", "t")
    val right = Seq(("a", 10L, 100.0)).toDF("k", "qt", "px")
    val got = AsOf.joinAsOf(left, right, Seq("k"), "t", "qt", Seq("px"),
        tolerance = Some(org.apache.spark.sql.functions.lit(10L)))
      .select($"id", $"px_asof").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map(1L -> Some(100.0), 2L -> None, 3L -> None))
    // and without tolerance the stale match still attaches (unchanged default)
    val noTol = AsOf.joinAsOf(left, right, Seq("k"), "t", "qt", Seq("px"))
      .filter($"id" === 2L).select($"px_asof").collect()(0).getDouble(0)
    assert(noTol == 100.0)
  }

  test("joinAsOf plans one shuffle on the key — no range join, no nested loop") {
    import spark.implicits._
    val left = (0 until 50).map(i => (i.toLong, s"k${i % 3}", i.toLong)).toDF("id", "k", "t")
    val right = (0 until 50).map(j => (s"k${j % 3}", j.toLong, j.toDouble)).toDF("k", "qt", "v")
    val plan = AsOf.joinAsOf(left, right, Seq("k"), "t", "qt", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"as-of fell back to a product plan:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 2, s"expected at most union+window shuffles, got $shuffles:\n$plan")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.IntervalJoin

class IntervalJoinSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  test("bucketed interval join equals the naive range join, no duplicates") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // intervals of varied length (some spanning many buckets), 3 keys
    val intervals = (0 until 60).map { i =>
      val start = rnd.nextInt(100000).toLong
      (i.toLong, s"k${i % 3}", start, start + 1 + rnd.nextInt(30000).toLong)
    }.toDF("iid", "key", "s", "e")
    val points = (0 until 2000).map { j =>
      (j.toLong, s"k${j % 3}", rnd.nextInt(130000).toLong)
    }.toDF("pid", "key", "ts")

    val got = IntervalJoin.bucketedIntervalJoin(
        intervals, points, Seq("key"), "s", "e", "ts", bucketUs = 5000L)
      .select($"iid", $"pid").collect().map(r => (r.getLong(0), r.getLong(1)))

    val want = intervals.join(points, Seq("key"))
      .filter($"ts" >= $"s" && $"ts" < $"e")
      .select($"iid", $"pid").collect().map(r => (r.getLong(0), r.getLong(1)))

    assert(got.length == got.distinct.length, "bucketing produced duplicate pairs")
    assert(got.sorted.toSeq == want.sorted.toSeq)
  }

  test("plan is an equi-join on (key, bucket), not a nested loop") {
    import spark.implicits._
    val intervals = (0 until 100).map(i => (i.toLong, "k", i * 100L, i * 100L + 500L))
      .toDF("iid", "key", "s", "e")
    val points = (0 until 100).map(j => (j.toLong, "k", j * 77L)).toDF("pid", "key", "ts")
    val plan = IntervalJoin.bucketedIntervalJoin(
        intervals, points, Seq("key"), "s", "e", "ts", bucketUs = 250L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"),
      s"interval join fell back to a nested loop:\n$plan")
    assert(plan.contains("__bucket"),
      s"expected the bucket column in the join keys:\n$plan")
  }

  test("overlap join equals the naive overlap join, keyless, no duplicates") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val left = (0 until 50).map { i =>
      val s = rnd.nextInt(100000).toLong
      (i.toLong, s, s + 1 + rnd.nextInt(40000).toLong)
    }.toDF("lid", "ls", "le")
    val right = (0 until 80).map { j =>
      val s = rnd.nextInt(120000).toLong
      (j.toLong, s, s + 1 + rnd.nextInt(25000).toLong)
    }.toDF("rid", "rs", "re")
    val got = IntervalJoin.bucketedOverlapJoin(
        left, right, Seq.empty, "ls", "le", "rs", "re", bucketUs = 7000L)
      .select($"lid", $"rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = left.crossJoin(right)
      .filter($"ls" < $"re" && $"rs" < $"le")
      .select($"lid", $"rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length,
      "first-common-bucket dedup failed: duplicate pairs")
    assert(got.sorted.toSeq == want.sorted.toSeq)
  }

  test("a hot bucket triggers AQE skew split — the design claim, executed") {
    import spark.implicits._
    // The scale argument for bucketing over a nested loop is that a hot
    // bucket is an ordinary skewed equi-join key, so AQE can split it at
    // runtime. Prove it: one bucket holds ~all points, thresholds tuned
    // so the runtime detector fires, and the FINAL adaptive plan must
    // carry the skew=true marker — with results identical to the naive
    // range join.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
      conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1k")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // 40k points burst into bucket 0; a trickle elsewhere. 5 intervals
      // cover the burst window, 50 cover the tail.
      val points = spark.range(40000)
        .select($"id".as("pid"), lit("k").as("key"), ($"id" % 1000L).as("ts"))
        .union(spark.range(40000, 41000)
          .select($"id".as("pid"), lit("k").as("key"), (($"id" % 100L) * 1000L + 1000L).as("ts")))
      val intervals = ((0 until 5).map(i => (i.toLong, "k", i * 200L, i * 200L + 200L)) ++
        (5 until 55).map(i => (i.toLong, "k", 1000L + (i - 5) * 2000L, 1000L + (i - 5) * 2000L + 2000L)))
        .toDF("iid", "key", "s", "e")

      val joined = IntervalJoin.bucketedIntervalJoin(
        intervals, points, Seq("key"), "s", "e", "ts", bucketUs = 1000L)
      // materialize THIS DataFrame's own query execution (count() would
      // plan a separate one), then read the finalized adaptive plan
      val n = joined.collect().length.toLong
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), s"plan not finalized:\n$finalPlan")
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the hot bucket's join as skewed:\n$finalPlan")

      val want = intervals.join(points, Seq("key"))
        .filter($"ts" >= $"s" && $"ts" < $"e").count()
      assert(n == want, s"skew-split result diverged: $n vs $want")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("empty and degenerate intervals are dropped, boundary semantics [start, end)") {
    import spark.implicits._
    val intervals = Seq(
      (1L, "k", 100L, 200L),  // normal
      (2L, "k", 300L, 300L),  // empty -> dropped
      (3L, "k", 400L, 300L)   // reversed -> dropped
    ).toDF("iid", "key", "s", "e")
    val points = Seq(
      (10L, "k", 100L),  // == start: IN
      (11L, "k", 199L),  // in
      (12L, "k", 200L),  // == end: OUT
      (13L, "k", 300L)
    ).toDF("pid", "key", "ts")
    val got = IntervalJoin.bucketedIntervalJoin(
        intervals, points, Seq("key"), "s", "e", "ts", bucketUs = 50L)
      .select($"iid", $"pid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == Seq((1L, 10L), (1L, 11L)))
  }
}

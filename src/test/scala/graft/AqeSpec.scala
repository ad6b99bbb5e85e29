package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Machine-checked evidence for the docs/PLANS.md claims about the big
  * TPC-H-shaped joins, read off POST-EXECUTION adaptive plans at sf0.1
  * (the style BucketingSpec uses for the bucketed-join story):
  *
  *  - q_shipping_priority: date filters reach the parquet scans as
  *    PushedFilters; top-10 is TakeOrderedAndProject, not a global sort;
  *  - q_local_supplier: the lineitem fact is consumed by broadcast
  *    joins without an Exchange on the fact's join keys;
  *  - AQE flips a statically-planned SortMergeJoin to BroadcastHashJoin
  *    from runtime stats (the "orders outgrows broadcast" story run in
  *    reverse, mechanically);
  *  - AQE splits a skewed SMJ partition (skew=true in the final plan).
  */
class AqeSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)
  private val sfDir = "/root/testdata/sf0.1"

  /** Execute fully, then return the final adaptive plan string. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q_shipping_priority: pushed date filters + TakeOrderedAndProject (sf0.1)") {
    val plan = finalPlan(SparkEntry.queries("q_shipping_priority")(spark, sfDir))
    assert(plan.contains("isFinalPlan=true"), s"not an executed adaptive plan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-10 must not be a global sort:\n$plan")
    // both date predicates must reach their parquet scans
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*l_shipdate.*"),
      s"l_shipdate filter not pushed:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*o_orderdate.*"),
      s"o_orderdate filter not pushed:\n$plan")
  }

  test("q_local_supplier: fact table feeds broadcast joins, never shuffled on its keys (sf0.1)") {
    val plan = finalPlan(SparkEntry.queries("q_local_supplier")(spark, sfDir))
    assert(plan.contains("isFinalPlan=true"))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast chain:\n$plan")
    // the fact is never exchanged on a join key — the only shuffle is
    // the 5-row final aggregate
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"lineitem shuffled on l_orderkey:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(l_suppkey"),
      s"lineitem shuffled on l_suppkey:\n$plan")
  }

  test("AQE flips a statically-planned SMJ to broadcast from runtime stats (sf0.1)") {
    withConfs(
      // static planner: no broadcasts at all -> SMJ everywhere
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // adaptive re-plan: runtime sizes under 20 MB may broadcast
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "20971520") {
      import spark.implicits._
      val o = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey")
      val l = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_quantity")
      val joined = l.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_custkey").agg(sum($"l_quantity").as("q"))
      // statically the join is an SMJ...
      assert(joined.queryExecution.sparkPlan.toString.contains("SortMergeJoin"),
        "setup broken: static plan should be SMJ with broadcasts disabled")
      // ...and the executed adaptive plan flipped it to broadcast
      val plan = finalPlan(joined)
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("BroadcastHashJoin"),
        s"AQE did not flip SMJ to broadcast:\n$plan")
    }
  }

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768") {
      import spark.implicits._
      // 90% of the left rows land on key 0 — one reducer partition gets
      // ~10x the median byte size and must be split
      val left = spark.range(200000)
        .select(
          when($"id" % 10 =!= 0, lit(0L)).otherwise($"id").as("key"),
          concat(lit("payload-"), $"id", lit("-"), md5($"id".cast("string"))).as("pay"))
      val right = spark.range(100).select($"id".as("key"), md5($"id".cast("string")).as("r"))
      // downstream must not need hash partitioning on the join key: AQE
      // refuses a skew split that would force an extra Exchange (a
      // keyed groupBy here reuses the join's partitioning and blocks
      // OptimizeSkewedJoin) — a global aggregate has no such demand
      val joined = left.join(right, "key").agg(count(lit(1)).as("n"))
      val plan = finalPlan(joined)
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"no skew split in the adaptive plan:\n$plan")
    }
  }
}

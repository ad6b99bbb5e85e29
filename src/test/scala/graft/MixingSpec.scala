package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Mixing

class MixingSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  test("mixKeys: weighted round-robin interleave, hand-computed") {
    import spark.implicits._
    // source a (weight 2): ranks 1..4 -> keys .25 .75 1.25 1.75
    // source b (weight 1): ranks 1..2 -> keys .5 1.5
    val df = Seq(
      (0L, "a"), (1L, "b"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "a")
    ).toDF("id", "src")
    val out = Mixing.mixKeys(df, "id", "src", Map("a" -> 2.0))
      .orderBy("mix_key").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (0L, "a", 1L, 0.25), (1L, "b", 1L, 0.5), (2L, "a", 2L, 0.75),
      (3L, "a", 3L, 1.25), (4L, "b", 2L, 1.5), (5L, "a", 4L, 1.75)))
    // the mixed stream carries "a" twice as often as "b"
    assert(out.count(_._2 == "a") == 2 * out.count(_._2 == "b"))
  }

  test("two-level rank equals the naive per-source window across many buckets") {
    import spark.implicits._
    val df = (0L until 400L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val fast = Mixing.mixKeys(df, "id", "src", Map("s0" -> 2.0), bucketSpan = 7L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("id"))
    val naive = df.select(col("id"), col("src").as("source"))
      .withColumn("src_rank", row_number().over(w).cast("long"))
      .withColumn("mix_key", round((col("src_rank") - lit(0.5)) /
        when(col("source") === "s0", 2.0).otherwise(1.0), 6))
    assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty)
  }
}

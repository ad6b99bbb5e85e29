package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sampling

class SamplingSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  test("systematicByWeight matches the serial cumulative-sum definition") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0L until 500L).map(i => (i, rnd.nextInt(400) + 1))
    val df = rows.toDF("id", "w")
    val step = 1000L
    // serial reference: cumulative weight in id order, keep crossings
    var cum = 0L
    val expected = rows.flatMap { case (id, w) =>
      cum += w
      if (cum % step < w) Some((id, cum)) else None
    }.toSet
    // bucketSpan smaller than the id range so multiple buckets + offsets
    // are actually exercised
    val got = Sampling.systematicByWeight(df, "id", "w", step, bucketSpan = 64L)
      .select($"id", $"cum").as[(Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("deterministicShuffle assigns a dense global rank in hash order") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (0L until 1000L).toDF("id")
    val got = Sampling.deterministicShuffle(df, "id", "s1", bucketBits = 4)
      .select($"id", $"shuffle_key", $"pos")
      .as[(Long, Long, Long)].collect()
    // pos is a permutation of 1..n
    assert(got.map(_._3).sorted.toSeq == (1L to 1000L))
    // and ranks exactly by (shuffle_key, id)
    val byPos = got.sortBy(_._3).map(r => (r._2, r._1)).toSeq
    assert(byPos == got.map(r => (r._2, r._1)).sortBy(identity).toSeq)
    // same salt reproduces; different salt permutes differently
    val again = Sampling.deterministicShuffle(df, "id", "s1", bucketBits = 4)
      .select($"id", $"pos").as[(Long, Long)].collect().toMap
    assert(got.forall(r => again(r._1) == r._3))
    val other = Sampling.deterministicShuffle(df, "id", "s2", bucketBits = 4)
      .select($"id", $"pos").as[(Long, Long)].collect().toMap
    assert(got.exists(r => other(r._1) != r._3))
  }

  test("trainValTestSplit is stable and roughly proportional") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
      .withColumn("split",
        Sampling.trainValTestSplit(org.apache.spark.sql.functions.col("id")
          .cast("string"), "salt1"))
    val counts = df.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 1600 && counts("train") < 1950)
    // same salt -> identical assignment; different salt -> different
    val again = (0L until 2000L).toDF("id")
      .withColumn("split",
        Sampling.trainValTestSplit(org.apache.spark.sql.functions.col("id")
          .cast("string"), "salt1"))
    assert(df.except(again).count() == 0)
    val other = (0L until 2000L).toDF("id")
      .withColumn("split",
        Sampling.trainValTestSplit(org.apache.spark.sql.functions.col("id")
          .cast("string"), "salt2"))
    assert(df.except(other).count() > 0)
  }

  test("packSequences: hand-computed bins/offsets, pack-with-overflow layout") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((0L, 4L), (1L, 5L), (2L, 3L), (3L, 8L), (4L, 2L))
      .toDF("id", "n_tokens")
    val out = graft.ops.Packing.packSequences(df, "id", "n_tokens", capacity = 10L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // cum_before: 0, 4, 9, 12, 20 -> (bin, offset)
    assert(out == Map(0L -> (0L, 0L), 1L -> (0L, 4L), 2L -> (0L, 9L),
      3L -> (1L, 2L), 4L -> (2L, 0L)))
  }

  test("packSequences two-level prefix sum equals the naive global window") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (0L until 500L).toDF("id")
      .withColumn("n_tokens", (pmod(col("id") * 37 + 11, lit(90)) + 1))
    // tiny bucketSpan so many buckets participate
    val packed = graft.ops.Packing.packSequences(df, "id", "n_tokens",
        capacity = 128L, bucketSpan = 13L)
      .select("id", "bin", "offset")
    val wAll = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val naive = df
      .withColumn("cum0", coalesce(sum(col("n_tokens")).over(wAll), lit(0L)))
      .select(col("id"), expr("cum0 div 128").as("bin"),
        pmod(col("cum0"), lit(128L)).as("offset"))
    assert(packed.except(naive).isEmpty && naive.except(packed).isEmpty)
  }
}

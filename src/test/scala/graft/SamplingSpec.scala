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
}

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

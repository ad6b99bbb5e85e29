package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SkewJoin

class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  test("salted join returns exactly the plain join's rows") {
    import spark.implicits._
    // hot key 1 holds 90% of probe rows
    val probe = spark.range(1000)
      .select(when($"id" < 900, 1L).otherwise($"id" % 50).as("k"), $"id".as("v"))
    val build = spark.range(60).select($"id".as("k"), ($"id" * 10).as("w"))

    for (jt <- Seq("inner", "left")) {
      val plain = probe.join(build, Seq("k"), jt)
        .select("k", "v", "w").collect().map(_.toString).sorted
      val salted = SkewJoin.saltedJoin(probe, build, Seq("k"), salt = 8, joinType = jt)
        .select("k", "v", "w").collect().map(_.toString).sorted
      assert(salted.sameElements(plain), s"$jt salted join diverged")
    }
  }

  test("salting spreads a hot key across salt values deterministically") {
    import spark.implicits._
    val probe = spark.range(1000).select(lit(1L).as("k"), $"id".as("v"))
    val salts = probe
      .withColumn("__salt", pmod(xxhash64($"v"), lit(8)).cast("int"))
      .groupBy("__salt").count().collect()
    assert(salts.length == 8, "hot key should hit all 8 salt buckets")
    assert(salts.map(_.getLong(1)).max < 1000, "no bucket should hold everything")
  }

  test("vec_dot is registered as a SQL function via GraftExtensions") {
    val r = spark.sql(
      "SELECT vec_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d")
      .collect()(0).getDouble(0)
    assert(r == 11.0)
  }
}

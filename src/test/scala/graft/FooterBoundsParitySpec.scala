package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.ops.Upsert.footerBoundsLocal]] — the driver-side
  * footer-bounds pass a small commit takes — row-for-row equal to the
  * distributed [[footerBoundsMulti]] path on a fixture that exercises
  * every aggregation subtlety: multiple row groups per file, integral
  * AND string keys, all-null columns (no manifest row), partition-dir
  * keys, and non-ASCII strings (UTF8String binary order vs Java's
  * UTF-16 order — the case a naive String.compareTo would get wrong).
  */
class FooterBoundsParitySpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  private val base = "/tmp/graft_footerparity"

  test("driver-side footer bounds equal the distributed pass") {
    import spark.implicits._
    val dir = s"$base/flat"
    // small row groups force several blocks per file; 😀 (surrogate
    // pair) sorts ABOVE ￿ in UTF-8 binary order but BELOW it in
    // UTF-16 code-unit order — the ordering trap
    val df = Seq(
      (5L, "m", "￿"), (1L, "a", "😀x"), (9L, "z", "zz"),
      (3L, "k", "aa"), (7L, "q", "￾"), (2L, "b", "😀a"))
      .toDF("k", "s", "u")
      .withColumn("allnull", lit(null).cast("string"))
    df.repartition(2).write
      .option("parquet.block.size", "1024")
      .mode("overwrite").parquet(dir)

    val files = graft.ops.Layout.listDataFiles(spark, dir)
    val keys = Seq(
      "k" -> org.apache.spark.sql.types.LongType,
      "s" -> org.apache.spark.sql.types.StringType,
      "u" -> org.apache.spark.sql.types.StringType,
      "allnull" -> org.apache.spark.sql.types.StringType)

    val local = graft.ops.Upsert.footerBoundsLocal(spark, files, keys, dir)
      .toSet
    val dist = graft.ops.Upsert.footerBoundsMulti(spark, files, keys, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(local == dist,
      s"local-vs-distributed footer bounds diverged:\n local=$local\n dist=$dist")
    // the all-null string column's handling (parquet-java renders its
    // empty min/max as "" on both paths) is covered by the set equality
    // above — the invariant is PARITY, not a particular rendering
  }

  test("partition-directory keys resolve without reading footers") {
    import spark.implicits._
    val dir = s"$base/hive"
    Seq((1L, "x", "p1"), (2L, "y", "p2"), (3L, "z", "p1"))
      .toDF("k", "v", "part")
      .write.partitionBy("part").mode("overwrite").parquet(dir)
    val files = graft.ops.Layout.listDataFiles(spark, dir)
    val keys = Seq(
      "part" -> org.apache.spark.sql.types.StringType,
      "k" -> org.apache.spark.sql.types.LongType)
    val local = graft.ops.Upsert.footerBoundsLocal(spark, files, keys, dir).toSet
    val dist = graft.ops.Upsert.footerBoundsMulti(spark, files, keys, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(local == dist)
    // partition values ride as identical mn == mx rows
    assert(local.exists(t => t._2 == "part" && t._3 == "p1" && t._4 == "p1"))
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the predicate COW verbs: across seeded-random
  * tables (duplicate keys, NULL-bearing group column, multi-file
  * range layout) and a predicate/assignment grammar, updateWhere and
  * deleteWhere must equal their DEFINITIONS computed by a naive full
  * rewrite in plain Spark — same rows, any file layout. */
class UpdateWherePropSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)
  import graft.ops.Upsert

  private val base = "/tmp/graft_updwprop"

  private def collectSorted(df: DataFrame): Seq[String] =
    df.select(col("k"), col("grp"), col("v"))
      .collect()
      .map(r => s"${r.get(0)}|${r.get(1)}|${r.get(2)}")
      .sorted.toSeq

  test("updateWhere/deleteWhere equal the naive full rewrite on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)

    for (iter <- 0 until 8) {
      val n = 50 + rnd.nextInt(150)
      val dupMod = 5 + rnd.nextInt(45) // key space smaller than n => dups
      val rows = (0 until n).map { i =>
        val k = (rnd.nextInt(dupMod) * 3).toLong
        val grp = rnd.nextInt(4) match {
          case 0 => null; case 1 => "a"; case 2 => "b"; case _ => "c"
        }
        (k, grp, rnd.nextInt(1000).toLong)
      }
      val tbl = s"$base/t$iter"
      rows.toDF("k", "grp", "v")
        .repartitionByRange(4, $"k").sortWithinPartitions($"k")
        .write.mode("overwrite").parquet(tbl)
      val src = spark.read.parquet(tbl)

      val predicate: Column = rnd.nextInt(5) match {
        case 0 => $"v" % (2 + rnd.nextInt(5)) === 0
        case 1 => $"grp" === "a"
        case 2 => $"grp".isNull && $"v" < 500
        case 3 => $"k" >= (dupMod / 2 * 3) && $"v" % 3 =!= 1
        case _ => $"grp" =!= "b" // NULL grp rows: predicate NULL, no match
      }
      val assigns: Seq[(String, Column)] = rnd.nextInt(3) match {
        case 0 => Seq("v" -> ($"v" * 2 + 1))
        case 1 => Seq("grp" -> concat(coalesce($"grp", lit("_")), lit("!")),
          "v" -> lit(0L))
        case _ => Seq("v" -> $"k") // reads another column
      }

      // ---- updateWhere vs definition ----
      val updOut = s"$base/u$iter"
      Upsert.updateWhere(spark, tbl, updOut, "k", predicate, assigns)
      val setMap = assigns.toMap
      val reference = src.select(src.schema.fieldNames.map { c =>
        setMap.get(c) match {
          case Some(e) =>
            when(predicate, e.cast(src.schema(c).dataType))
              .otherwise(col(c)).as(c)
          case None => col(c)
        }
      }.toSeq: _*)
      assert(collectSorted(spark.read.parquet(updOut)) ==
        collectSorted(reference), s"updateWhere diverged at iter $iter")

      // ---- deleteWhere vs definition (NULL predicate = keep) ----
      val delOut = s"$base/d$iter"
      Upsert.deleteWhere(spark, tbl, delOut, "k", predicate)
      assert(collectSorted(spark.read.parquet(delOut)) ==
        collectSorted(src.filter(!coalesce(predicate, lit(false)))),
        s"deleteWhere diverged at iter $iter")
    }
  }
}

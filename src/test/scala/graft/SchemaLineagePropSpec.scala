package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the `_schema.json` lineage: across seeded-random
  * verb chains (COW upsert, schema-evolving upsert, key delete, DV
  * delete, DV compaction, predicate update, clone), every snapshot's
  * sidecar-driven read must equal the mergeSchema footer-sweep read
  * EXACTLY — same logical schema (name set) and same rows — and once
  * a lineage is bootstrapped the sidecar must never go missing. */
class SchemaLineagePropSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)
  import graft.ops.Upsert

  private val base = "/tmp/graft_schemaprop"

  private def sweepRead(dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  private def assertSameLogical(dir: String, step: String): Unit = {
    val viaSidecar = Upsert.readSchemaSidecar(dir) match {
      case Some(s) => spark.read.schema(s).parquet(dir)
      case None => fail(s"$step: sidecar missing at $dir")
    }
    val sweep = sweepRead(dir)
    assert(viaSidecar.schema.fieldNames.sorted.toSeq ==
      sweep.schema.fieldNames.sorted.toSeq,
      s"$step: schema drift sidecar=${viaSidecar.schema.fieldNames.toSeq} " +
        s"sweep=${sweep.schema.fieldNames.toSeq}")
    val aligned = sweep.select(viaSidecar.schema.fieldNames.map(col).toSeq: _*)
    assert(viaSidecar.exceptAll(aligned).isEmpty &&
      aligned.exceptAll(viaSidecar).isEmpty,
      s"$step: sidecar read and sweep read disagree on rows")
  }

  test("random verb chains: sidecar read equals the footer sweep at every step") {
    import spark.implicits._
    val rnd = new scala.util.Random(42L)

    for (chain <- 0 until 3) {
      val root = s"$base/c$chain"
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root))
      spark.range(800).select($"id".as("k"), ($"id" * 2).as("v"))
        .repartitionByRange(4, $"k").sortWithinPartitions($"k")
        .write.mode("overwrite").parquet(s"$root/s0")
      var cur = s"$root/s0"
      var evolved = 0
      var hasDv = false

      for (step <- 1 to 7) {
        val out = s"$root/s$step"
        // step 1 must be a commit verb: it BOOTSTRAPS the sidecar (a
        // clone of the raw s0 would carry nothing to check)
        val verb = if (step == 1) 0 else rnd.nextInt(6)
        verb match {
          case 0 => // plain upsert: full-logical-schema rows (a batch
            // missing an evolved column refuses without the evolution
            // flag — the strict contract this spec's failure earned)
            val live = Upsert.readWithDeletes(spark, cur)
            Upsert.upsertByKey(spark, cur, out,
              live.filter(pmod($"k", lit(13L)) === (step % 13).toLong)
                .withColumn("v", lit(-1L * step)),
              "k")
          case 1 => // schema-evolving upsert: brand-new column each time
            evolved += 1
            Upsert.upsertByKey(spark, cur, out,
              Seq((rnd.nextInt(800).toLong, -2L, s"e$evolved"))
                .toDF("k", "v", s"c$evolved"),
              "k", allowSchemaEvolution = true)
          case 2 => // key delete
            Upsert.deleteByKey(spark, cur, out,
              spark.range(rnd.nextInt(30) + 1)
                .select(($"id" * 7 + rnd.nextInt(100)).as("k")), "k")
          case 3 => // DV soft delete (stacks; folded by any later commit)
            Upsert.deleteByKeyDV(spark, cur, out,
              spark.range(rnd.nextInt(20) + 1)
                .select(($"id" * 11 + rnd.nextInt(200)).as("k")), "k")
          case 4 if hasDv => // fold the DV back into a clean rewrite
            Upsert.compactDeletes(spark, cur, out)
          case 4 => // predicate update (refuses on a foreign-key DV — skip)
            Upsert.updateWhere(spark, cur, out, "k",
              $"k" % (rnd.nextInt(9) + 2) === 0, Seq("v" -> ($"v" + 100L)))
          case _ => // shallow clone
            Upsert.cloneSnapshot(spark, cur, out)
        }
        // ground truth from the filesystem: commits fold a same-key DV
        // (output DV-free), DV deletes stack it, clones carry it
        hasDv = new java.io.File(s"$out/_dv/_SUCCESS").exists
        // every verb output must carry the sidecar (s0 bootstrapped by
        // the first commit) and read identically both ways
        assertSameLogical(out, s"chain $chain step $step")
        cur = out
      }
    }
  }

  test("PARTITIONED verb chains: sidecar read equals the footer sweep; partition values survive") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242L)
    val keys = Seq("p", "k")

    for (chain <- 0 until 2) {
      val root = s"$base/part$chain"
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root))
      spark.range(600)
        .select(pmod($"id", lit(3L)).cast("int").as("p"),
          $"id".as("k"), ($"id" * 2).as("v"))
        .repartitionByRange(2, $"k")
        .write.partitionBy("p").parquet(s"$root/s0")
      var cur = s"$root/s0"
      var evolved = 0

      for (step <- 1 to 6) {
        val out = s"$root/s$step"
        val verb = if (step == 1) 0 else rnd.nextInt(5)
        verb match {
          case 0 => // tuple upsert over the live view
            val live = Upsert.readWithDeletes(spark, cur)
            Upsert.upsertByKeys(spark, cur, out,
              live.filter(pmod($"k", lit(11L)) === (step % 11).toLong)
                .withColumn("v", lit(-1L * step)),
              keys)
          case 1 => // schema-evolving tuple upsert on the partitioned grain
            evolved += 1
            Upsert.upsertByKeys(spark, cur, out,
              Seq((rnd.nextInt(3), rnd.nextInt(600).toLong, -2L,
                s"e$evolved")).toDF("p", "k", "v", s"pc$evolved"),
              keys, allowSchemaEvolution = true)
          case 2 => // tuple delete
            Upsert.deleteByKeys(spark, cur, out,
              spark.range(rnd.nextInt(15) + 1)
                .select(pmod($"id", lit(3L)).cast("int").as("p"),
                  ($"id" * 5 + rnd.nextInt(40)).as("k")), keys)
          case 3 => // predicate update, partition-led
            Upsert.updateWhereKeys(spark, cur, out, keys,
              $"p" === rnd.nextInt(3) && $"k" % 7 === 0,
              Seq("v" -> ($"v" + 1000L)))
          case _ => // shallow clone must carry partition dirs verbatim
            Upsert.cloneSnapshot(spark, cur, out)
        }
        assertSameLogical(out, s"partitioned chain $chain step $step")
        // the partition column never degrades: every row still carries
        // a concrete p, and dir-derived values equal the stored grain
        val got = Upsert.readWithDeletes(spark, out)
        assert(got.filter($"p".isNull).count() == 0,
          s"chain $chain step $step: partition values lost")
        cur = out
      }
    }
  }

  test("composite-key verb chains: sidecar read equals the footer sweep at every step") {
    import spark.implicits._
    val rnd = new scala.util.Random(1337L)
    val keys = Seq("k1", "k2")

    for (chain <- 0 until 2) {
      val root = s"$base/comp$chain"
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root))
      spark.range(800)
        .select(($"id" / 4).cast("long").as("k1"),
          pmod($"id", lit(4L)).as("k2"), ($"id" * 2).as("v"))
        .repartitionByRange(4, $"k1", $"k2")
        .sortWithinPartitions($"k1", $"k2")
        .write.mode("overwrite").parquet(s"$root/s0")
      var cur = s"$root/s0"
      var evolved = 0

      for (step <- 1 to 6) {
        val out = s"$root/s$step"
        val verb = if (step == 1) 0 else rnd.nextInt(5)
        verb match {
          case 0 => // tuple upsert over the live view
            val live = Upsert.readWithDeletes(spark, cur)
            Upsert.upsertByKeys(spark, cur, out,
              live.filter(pmod($"k1", lit(13L)) === (step % 13).toLong)
                .withColumn("v", lit(-1L * step)),
              keys)
          case 1 => // schema-evolving tuple upsert: new column each time
            evolved += 1
            Upsert.upsertByKeys(spark, cur, out,
              Seq((rnd.nextInt(200).toLong, rnd.nextInt(4).toLong, -2L,
                s"e$evolved")).toDF("k1", "k2", "v", s"cc$evolved"),
              keys, allowSchemaEvolution = true)
          case 2 => // tuple delete
            Upsert.deleteByKeys(spark, cur, out,
              spark.range(rnd.nextInt(20) + 1)
                .select(($"id" * 3 + rnd.nextInt(50)).as("k1"),
                  pmod($"id", lit(4L)).as("k2")), keys)
          case 3 => // predicate update on the tuple grain
            Upsert.updateWhereKeys(spark, cur, out, keys,
              $"k1" % (rnd.nextInt(7) + 2) === 0, Seq("v" -> ($"v" + 100L)))
          case _ => // predicate delete, often matching nothing
            // (exercises the zero-match pure-link commit)
            Upsert.deleteWhereKeys(spark, cur, out, keys,
              $"v" < lit(-1000L + rnd.nextInt(100)))
        }
        assertSameLogical(out, s"composite chain $chain step $step")
        cur = out
      }
    }
  }
}

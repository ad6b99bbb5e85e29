package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{AnnIndex, Similarity}

class AnnIndexSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  private def fixture = {
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    (e.select($"vec_id".as("id"), $"embedding"),
      e.filter($"vec_id" < 8).select($"vec_id".as("cid"), $"embedding"),
      e.filter($"vec_id" >= 10 && $"vec_id" < 30).select($"vec_id".as("qid"), $"embedding"))
  }

  test("reloaded index returns bit-identical top-k to the inline fit") {
    val (corpus, cents, queries) = fixture
    val cb = Similarity.pqCodebook(corpus, "id", "embedding", numSub = 8, codes = 8)
    val dir = java.nio.file.Files.createTempDirectory("ann_index").toString

    val inline = Similarity.ivfPqTopK(queries, corpus, cents, cb, k = 3, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq

    AnnIndex.write(corpus, cents, cb, dir)
    val reloaded = AnnIndex.topK(queries, AnnIndex.read(spark, dir), k = 3, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq

    assert(inline.nonEmpty)
    assert(reloaded == inline, "persist/reload changed the top-k")
  }

  test("codebook round-trips exactly through parquet") {
    val (corpus, cents, _) = fixture
    val cb = Similarity.pqCodebook(corpus, "id", "embedding", numSub = 8, codes = 8)
    val dir = java.nio.file.Files.createTempDirectory("ann_cb").toString
    AnnIndex.write(corpus, cents, cb, dir)
    val got = AnnIndex.read(spark, dir).codebook
    assert(got.length == cb.length)
    for (mi <- cb.indices) {
      assert(got(mi).length == cb(mi).length)
      for (c <- cb(mi).indices)
        assert(got(mi)(c).toSeq == cb(mi)(c).toSeq,
          s"codebook[$mi][$c] drifted through parquet")
    }
  }

  test("append: delta encoded with existing artifacts == full rebuild, bit-identical probe") {
    import spark.implicits._
    val (corpus, cents, queries) = fixture
    // base keeps the first 8 ids (the codebook seeds), delta is a
    // deterministic slice of the rest
    val base = corpus.filter($"id" < 8 || $"id" % 5 =!= 3)
    val delta = corpus.filter($"id" >= 8 && $"id" % 5 === 3)
    assert(delta.count() > 0)
    val cb = Similarity.pqCodebook(base, "id", "embedding", numSub = 8, codes = 8)

    val full = java.nio.file.Files.createTempDirectory("ann_full").toString
    AnnIndex.write(corpus, cents, cb, full)
    val expect = AnnIndex.topK(queries, AnnIndex.read(spark, full), k = 3, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq

    val inc = java.nio.file.Files.createTempDirectory("ann_inc").toString
    AnnIndex.write(base, cents, cb, inc)
    AnnIndex.append(delta, inc)
    val got = AnnIndex.topK(queries, AnnIndex.read(spark, inc), k = 3, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq

    assert(expect.nonEmpty && got == expect,
      "appended index must answer probes exactly like the full rebuild")
    // append refuses an unbuilt index dir
    val bad = java.nio.file.Files.createTempDirectory("ann_nope").toString
    val e = intercept[IllegalArgumentException](AnnIndex.append(delta, bad))
    assert(e.getMessage.contains("INDEX_OK"))
  }

  test("read() refuses a directory without the completion marker") {
    val dir = java.nio.file.Files.createTempDirectory("ann_bad").toString
    val e = intercept[IllegalArgumentException](AnnIndex.read(spark, dir))
    assert(e.getMessage.contains("INDEX_OK"))
  }

  test("staleness contract: delete-only divergence reconciles; anything else refuses loudly") {
    import spark.implicits._
    val (corpus, cents, queries) = fixture
    val cb = Similarity.pqCodebook(corpus, "id", "embedding", numSub = 8, codes = 8)
    val base = java.nio.file.Files.createTempDirectory("ann_stale").toString
    val tbl = s"$base/table"; val idxDir = s"$base/index"
    corpus.write.parquet(s"$tbl/v0")
    graft.ops.Fs.writeTextAtomic(graft.ops.Fs.of(tbl, spark),
      new org.apache.hadoop.fs.Path(tbl, "CURRENT"), "v0")
    AnnIndex.write(corpus, cents, cb, idxDir, source = Some((tbl, "id")))
    assert(AnnIndex.readStamp(idxDir).contains((tbl, 0L, "id")))

    // fresh index: topKLive == topK
    val expect = AnnIndex.topK(queries, AnnIndex.read(spark, idxDir), 3, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val live0 = AnnIndex.topKLive(spark, idxDir, queries, 3, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(live0 == expect && expect.nonEmpty)

    // versioned DELETE past the stamp → reconcile: probe == index of
    // the SURVIVING corpus (rebuilt with the same immutable artifacts)
    spark.sql(s"DELETE FROM '$tbl' ON id WHERE id >= 40 AND id % 3 = 1").collect()
    val live1 = AnnIndex.topKLive(spark, idxDir, queries, 3, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val surviving = corpus.filter(!($"id" >= 40 && $"id" % 3 === 1))
    val rebuilt = java.nio.file.Files.createTempDirectory("ann_rebuilt").toString
    AnnIndex.write(surviving, cents, cb, rebuilt)
    val want = AnnIndex.topK(queries, AnnIndex.read(spark, rebuilt), 3, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(live1 == want, "reconciled probe must equal the surviving-rows index")
    assert(live1 != expect, "the delete must change some neighborhood at this scale")
    // the stale handle would still serve deleted ids — that's the
    // silent failure topKLive exists to close
    val deleted = corpus.filter($"id" >= 40 && $"id" % 3 === 1)
      .select("id").as[Long].collect().toSet
    assert(expect.exists(t => deleted.contains(t._2)),
      "precondition: the stale top-k actually contains a deleted id")
    assert(!live1.exists(t => deleted.contains(t._2)),
      "reconciled probe must never return a deleted id")

    // a MERGE past the stamp (rows the index never saw) must REFUSE
    corpus.filter($"id" < 4).withColumn("embedding", $"embedding")
      .createOrReplaceTempView("ann_stale_upd")
    spark.sql(
      s"""MERGE INTO '$tbl' USING (SELECT * FROM ann_stale_upd) ON id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    val e1 = intercept[IllegalStateException](
      AnnIndex.topKLive(spark, idxDir, queries, 3, 2))
    assert(e1.getMessage.contains("MERGE") &&
      e1.getMessage.contains("AnnIndex.append"), e1.getMessage)

    // append advances the stamp to CURRENT → probes work again
    AnnIndex.append(corpus.filter($"id" < 4), idxDir)
    assert(AnnIndex.readStamp(idxDir).exists(_._2 > 0L))
    AnnIndex.topKLive(spark, idxDir, queries, 3, 2).collect()

    // an UNSTAMPED index refuses topKLive (no contract to check)
    val plain = java.nio.file.Files.createTempDirectory("ann_plain").toString
    AnnIndex.write(corpus, cents, cb, plain)
    val e2 = intercept[IllegalStateException](
      AnnIndex.topKLive(spark, plain, queries, 3, 2))
    assert(e2.getMessage.contains("no source stamp"), e2.getMessage)

    // a table RESTORED below the stamp refuses (index is from the future)
    graft.ops.Fs.writeTextAtomic(graft.ops.Fs.of(tbl, spark),
      new org.apache.hadoop.fs.Path(tbl, "CURRENT"), "v0")
    // (commit log outranks the pointer; simulate by stamping above cur)
    val stamp = AnnIndex.readStamp(idxDir).get
    if (graft.ops.Upsert.currentVersion(tbl).exists(_ < stamp._2)) {
      val e3 = intercept[IllegalStateException](
        AnnIndex.topKLive(spark, idxDir, queries, 3, 2))
      assert(e3.getMessage.contains("restored"), e3.getMessage)
    }
  }

  test("the persisted codes table is cell-clustered (skippable row groups)") {
    val (corpus, cents, _) = fixture
    val cb = Similarity.pqCodebook(corpus, "id", "embedding", numSub = 8, codes = 8)
    val dir = java.nio.file.Files.createTempDirectory("ann_layout").toString
    AnnIndex.write(corpus, cents, cb, dir)
    // footer manifest over the codes table: cell min/max ranges of
    // distinct files must not all overlap — the clustering that lets a
    // probe skip most of the table at scale
    val stats = graft.ops.Layout.parquetFileStats(spark, s"$dir/codes.parquet")
      .filter(col("column") === "cell")
      .select(col("file"), col("min_value").cast("long"), col("max_value").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(stats.nonEmpty)
    if (stats.map(_._1).distinct.length > 1) {
      val ordered = stats.sortBy(_._2)
      val disjoint = ordered.sliding(2).forall {
        case Array((_, _, hi), (_, lo, _)) => lo >= hi
        case _ => true
      }
      assert(disjoint, s"codes files' cell ranges overlap: ${ordered.toSeq}")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ops.{AnnIndex, Similarity, Upsert}

/** Dev probe: incremental ANN maintenance economics (round-14
  * `AnnIndex.applyCdf`).
  *
  * Claim probed: after an UPDATE+DELETE wave on the indexed table,
  * `applyCdf` pays one codes-table rewrite (the codes table is ~30×
  * smaller than the float corpus: 8 one-byte codes + id vs 64×4-byte
  * floats per row) plus a DELTA-sized re-encode — while a rebuild
  * pays the full corpus scan, the codebook REFIT (k-means over every
  * subvector), and the full-corpus encode. The ratio should grow
  * with corpus size and be insensitive to wave size.
  *
  * Prints one JSON line per run:
  * {"n":…, "touched":…, "fit_s":…, "write_s":…, "apply_s":…,
  *  "rebuild_fit_s":…, "rebuild_write_s":…, "dropped":…, "appended":…}
  *
  * Usage: runMain graft.DevAnnMaint <sfDir> [mod | fixed:<W> | point:<K>]
  *   mod: the wave touches ids ≡3 (update) and ≡5 (delete) mod `mod`
  *   — default 100, i.e. ~2% of the corpus (corpus-proportional wave).
  *   fixed:<W>: the wave updates ids [100, 100+W) and deletes
  *   [100+W, 100+2W) — a FIXED-size delta, the row that adjudicates
  *   the round-15 file-granular rewrite: with the index laid out at
  *   ~2k rows/file (file count ∝ corpus, production's fixed-file-size
  *   shape), apply_s should be ~flat across corpus scales because
  *   only the files holding the W touched ids are rewritten.
  *   point:<K>: the wave updates K ids spread at corpus/K strides —
  *   the streaming maintainer's micro-batch shape. The output gains
  *   bloom_files/bloom_candidates: how many codes files the id Bloom
  *   sidecar had to keep for the wave vs the file count — at
  *   K ≪ files the prune is the difference between scanning the
  *   corpus's id column and opening only the true holder files.
  */
object DevAnnMaint {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spec = args.lift(1).getOrElse("100")
    val fixedW = if (spec.startsWith("fixed:")) Some(spec.drop(6).toLong) else None
    val pointK = if (spec.startsWith("point:")) Some(spec.drop(6).toLong) else None
    val mod = if (fixedW.isDefined || pointK.isDefined) 100L else spec.toLong
    val spark = GraftSession.local(
      math.min(32, Runtime.getRuntime.availableProcessors()))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    val base = s"/tmp/graft_ann_maint_${System.getProperty("user.name", "u")}"
    val fs = graft.ops.Fs.of(base, spark)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val tbl = s"$base/table"; val idx = s"$base/index"
    e.select($"vec_id".as("id"), $"embedding")
      .repartition(32).write.parquet(s"$tbl/v0")
    graft.ops.Fs.writeTextAtomic(fs,
      new org.apache.hadoop.fs.Path(tbl, "CURRENT"), "v0")
    val corpus = spark.read.parquet(s"$tbl/v0")
    val cents = e.filter($"vec_id" < 32)
      .select($"vec_id".as("cid"), $"embedding")

    // REBUILD cost, leg by leg: codebook refit + full encode/write.
    // File count ∝ corpus (~2k rows/file) — production's
    // fixed-file-size layout, which is what the file-granular rewrite
    // amortizes against.
    val parts = math.max(8L, n / 2000L).toInt
    val (cb, tFit) = time(
      Similarity.pqCodebook(corpus, "id", "embedding", numSub = 8, codes = 8))
    val (_, tWrite) = time(AnnIndex.write(corpus, cents, cb, idx,
      numRangePartitions = parts, source = Some((tbl, "id"))))

    // the wave past the stamp: corpus-proportional (mod), fixed (W),
    // or point (K scattered ids — the maintainer micro-batch shape)
    (fixedW, pointK) match {
      case (Some(w), _) =>
        spark.sql(s"UPDATE '$tbl' ON id SET embedding = " +
          s"transform(embedding, x -> -x) WHERE id >= 100 AND id < ${100 + w}").collect()
        spark.sql(s"DELETE FROM '$tbl' ON id WHERE id >= ${100 + w} AND id < ${100 + 2 * w}").collect()
      case (None, Some(k)) =>
        val stride = math.max(1L, n / math.max(1L, k))
        spark.sql(s"UPDATE '$tbl' ON id SET embedding = " +
          s"transform(embedding, x -> -x) WHERE id % $stride = 0 AND id < ${stride * k}").collect()
      case _ =>
        spark.sql(s"UPDATE '$tbl' ON id SET embedding = " +
          s"transform(embedding, x -> -x) WHERE id % $mod = 3").collect()
        spark.sql(s"DELETE FROM '$tbl' ON id WHERE id % $mod = 5").collect()
    }

    // the Bloom prune's effect for this wave, measured directly: how
    // many codes files survive the sidecar test (what the membership
    // scan will open) vs the file count
    val bloomStats = pointK.map { k =>
      val stride = math.max(1L, n / math.max(1L, k))
      val waveIds = spark.range(0, stride * k, stride).toDF("id")
      val files = graft.ops.Layout.listDataFiles(spark, s"$idx/codes.parquet")
      val kept = AnnIndex.bloomPruneCodes(spark, idx, files, waveIds)
      (files.size, kept.size)
    }

    val ((dropped, appended), tApply) = time(AnnIndex.applyCdf(spark, idx))

    // what the wave would have cost as a rebuild, on the same table
    val cur = Upsert.currentVersion(tbl).get
    val live = Upsert.readWithDeletes(spark, s"$tbl/v$cur")
      .select($"id", $"embedding")
    val (cb2, tFit2) = time(
      Similarity.pqCodebook(live, "id", "embedding", numSub = 8, codes = 8))
    val (_, tWrite2) = time(AnnIndex.write(live, cents, cb2, s"$base/index2",
      numRangePartitions = parts, source = Some((tbl, "id"))))

    // Locale.ROOT: the f-interpolator is default-locale-sensitive — a
    // comma-decimal locale (de/tr/fr) would emit invalid JSON
    val qerrRatio = AnnIndex.readQerrRatio(idx).map(_.toString).getOrElse("null")
    val bloomJson = bloomStats.fold("") { case (files, kept) =>
      s""","bloom_files":$files,"bloom_candidates":$kept"""
    }
    println(String.format(java.util.Locale.ROOT,
      """{"n":%d,"touched":%d,"fit_s":%.2f,"write_s":%.2f,""" +
        """"apply_s":%.2f,"rebuild_fit_s":%.2f,"rebuild_write_s":%.2f,""" +
        """"dropped":%d,"appended":%d,"qerr_ratio":%s%s}""",
      Long.box(n), Long.box(dropped + appended), Double.box(tFit),
      Double.box(tWrite), Double.box(tApply), Double.box(tFit2),
      Double.box(tWrite2), Long.box(dropped), Long.box(appended), qerrRatio,
      bloomJson))
    spark.stop()
  }
}

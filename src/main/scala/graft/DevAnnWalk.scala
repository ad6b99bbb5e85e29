package graft

import org.apache.spark.sql.functions._
import graft.ops.{AnnIndex, Fs, Similarity}

/** Dev probe: metadata op-counts of the ANN staleness walks vs gap
  * length (round-15 — adjudicate the batched-evidence rewrite with
  * op-count rows, the DevCommitOps shape).
  *
  * Claim probed: one `topKLive` adjudication over a G-version gap
  * costs O(1) LISTINGS (snapshot dir + `_commitlog`) plus at most one
  * verb read per published gap version — not the 1–3 sequential
  * round-trips per version the pre-r15 walk paid. On an object store
  * each op is an RPC, so the listing count IS the adjudication
  * latency model for a lagging maintainer.
  *
  * Prints one line per gap tier: gap, total ops, list ops, open ops.
  *
  * Usage: runMain graft.DevAnnWalk [gapTiers...]   (default 4 16 64)
  */
object DevAnnWalk {
  def main(args: Array[String]): Unit = {
    val tiers = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(4, 16, 64)
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.conf.set(AnnIndex.MaxWalkConf, tiers.max.toString)

    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = e.select($"vec_id".as("id"), $"embedding")
    val cents = e.filter($"vec_id" < 8).select($"vec_id".as("cid"), $"embedding")
    val queries = e.filter($"vec_id" >= 10 && $"vec_id" < 30)
      .select($"vec_id".as("qid"), $"embedding")
    val cb = Similarity.pqCodebook(corpus, "id", "embedding", numSub = 8, codes = 8)

    tiers.foreach { gap =>
      val base = s"/tmp/graft_annwalk_${System.nanoTime()}"
      val tbl = s"$base/table"; val idx = s"$base/index"
      corpus.write.parquet(s"$tbl/v0")
      Fs.writeTextAtomic(Fs.of(tbl, spark),
        new org.apache.hadoop.fs.Path(tbl, "CURRENT"), "v0")
      AnnIndex.write(corpus, cents, cb, idx, source = Some((tbl, "id")))
      // a delete-shaped wave of `gap` commits past the stamp (tiny
      // per-commit row sets so the probe prices METADATA, not data)
      (0 until gap).foreach(i => spark.sql(
        s"DELETE FROM '$tbl' ON id WHERE id >= 40 AND id % 997 = $i").collect())
      // warm-up adjudication (JIT, FS init), then the audited one
      AnnIndex.topKLive(spark, idx, queries, 3, 2).count()
      Fs.Audit.enable()
      AnnIndex.topKLive(spark, idx, queries, 3, 2).count()
      val t = Fs.Audit.disable()
      val lists = t.collect { case (k, n) if k.startsWith("list:") => n }.sum
      val opens = t.collect { case (k, n) if k.startsWith("open:") => n }.sum
      println(String.format(java.util.Locale.ROOT,
        """{"gap":%d,"ops":%d,"list":%d,"open":%d}""",
        Int.box(gap), Long.box(t.values.sum), Long.box(lists),
        Long.box(opens)))
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(base))
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Round-15 probe: leg timing of the q_ann_stream cycle (table + CDF
  * staging, index build, maintainer attach/waves/stop, probe).
  * Usage: runMain graft.DevOptStream [sfDir] */
object DevOptStream {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      math.min(32, Runtime.getRuntime.availableProcessors()))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[optstream] $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val base = s"/tmp/graft_devopt_stream_${System.getProperty("user.name", "u")}"
      val tbl = s"$base/table"; val path = s"$base/index"
      val fs = graft.ops.Fs.of(base, spark)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      t("table v0 + CURRENT + cdf0") {
        e.select($"vec_id".as("id"), $"embedding").write.parquet(s"$tbl/v0")
        graft.ops.Fs.writeTextAtomic(fs,
          new org.apache.hadoop.fs.Path(tbl, "CURRENT"), "v0")
        graft.ops.Upsert.materializeCdf(spark, tbl, 0L)
      }
      val corpus = spark.read.parquet(s"$tbl/v0")
      val cents = e.filter($"vec_id" < 8).select($"vec_id".as("cid"), $"embedding")
      val cb = t("pqCodebook")(
        graft.ops.Similarity.pqCodebook(corpus, "id", "embedding", numSub = 8, codes = 8))
      t("index write")(
        graft.ops.AnnIndex.write(corpus, cents, cb, path, source = Some((tbl, "id"))))
      val mq = t("maintainer start")(
        graft.streaming.Streams.annIndexMaintainer(spark, tbl, path, s"$base/ck"))
      try {
        t("processAllAvailable #1")(mq.processAllAvailable())
        t("UPDATE + cdf1") {
          spark.sql(s"UPDATE '$tbl' ON id SET embedding = " +
            "transform(embedding, x -> -x) WHERE id >= 40 AND id % 6 = 2").collect()
          graft.ops.Upsert.materializeCdf(spark, tbl, 1L)
        }
        t("DELETE + cdf2") {
          spark.sql(s"DELETE FROM '$tbl' ON id WHERE id >= 40 AND id % 6 = 4").collect()
          graft.ops.Upsert.materializeCdf(spark, tbl, 2L)
        }
        t("processAllAvailable #2")(mq.processAllAvailable())
      } finally t("stop")(mq.stop())
      t("probe") {
        graft.ops.AnnIndex.topKLive(spark, path,
          e.filter($"vec_id" >= 10 && $"vec_id" < 30)
            .select($"vec_id".as("qid"), $"embedding"),
          k = 3, probes = 2).collect()
      }
    }
    spark.stop()
  }
}

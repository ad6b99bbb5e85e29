package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Round-15 optimization probe: leg-by-leg wall time AND Spark job
  * count for the q_ann_update-shaped maintenance cycle — the evidence
  * base for cutting redundant jobs out of the ANN maintenance paths
  * (guide §1: measure first; §5: the driver should do almost no work —
  * every job at gate scale is ~100 ms of scheduling + codegen, so the
  * job COUNT is the cost model at sf0.1).
  *
  * Usage: runMain graft.DevOptAnn [sfDir]
  */
object DevOptAnn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      math.min(32, Runtime.getRuntime.availableProcessors()))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def leg[T](label: String)(f: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      // listener events are async; small settle for an honest count
      Thread.sleep(150)
      println(f"[optann] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  jobs=${jobs.get() - j0}")
      r
    }

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val base = s"/tmp/graft_devopt_ann_${System.getProperty("user.name", "u")}"
      val tbl = s"$base/table"; val path = s"$base/index"
      val fs = graft.ops.Fs.of(base, spark)
      leg("fs.delete")(fs.delete(new org.apache.hadoop.fs.Path(base), true))
      leg("table v0 write") {
        e.select($"vec_id".as("id"), $"embedding").write.parquet(s"$tbl/v0")
        graft.ops.Fs.writeTextAtomic(fs,
          new org.apache.hadoop.fs.Path(tbl, "CURRENT"), "v0")
      }
      val corpus = spark.read.parquet(s"$tbl/v0")
      val cents = e.filter($"vec_id" < 8).select($"vec_id".as("cid"), $"embedding")
      val cb = leg("pqCodebook")(
        graft.ops.Similarity.pqCodebook(corpus, "id", "embedding", numSub = 8, codes = 8))
      leg("AnnIndex.write")(
        graft.ops.AnnIndex.write(corpus, cents, cb, path, source = Some((tbl, "id"))))
      leg("SQL UPDATE")(
        spark.sql(s"UPDATE '$tbl' ON id SET embedding = " +
          "transform(embedding, x -> -x) WHERE id >= 40 AND id % 5 = 2").collect())
      leg("SQL DELETE")(
        spark.sql(s"DELETE FROM '$tbl' ON id WHERE id >= 40 AND id % 5 = 4").collect())
      leg("applyCdf")(
        graft.ops.AnnIndex.applyCdf(spark, path))
      leg("topKLive+collect") {
        graft.ops.AnnIndex.topKLive(spark, path,
          e.filter($"vec_id" >= 10 && $"vec_id" < 30)
            .select($"vec_id".as("qid"), $"embedding"),
          k = 3, probes = 2).collect()
      }
    }
    spark.stop()
  }
}

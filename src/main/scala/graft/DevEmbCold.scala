package graft

import org.apache.spark.sql.functions._

/** Dev probe: decompose q_emb_neardup's cold-start residual at a scale
  * tier (round-13 verdict #5 — 43.5 s cold vs ~13 s warm at 100x in
  * r12). Two modes, each a FRESH JVM so "cold" is real:
  *
  *   direct:  run the kernel immediately (cold scan + cold JIT), then
  *            twice more (warm floor).
  *   prescan: decode the whole embeddings parquet first (scan warm,
  *            page cache hot), then the kernel runs — the first-run
  *            delta vs `direct` is the SCAN's share of the cold cost;
  *            what remains above the warm floor is JIT/codegen.
  *
  * Run: SPARK_GRAFT_SF_DIR=<tier> sbt "runMain graft.DevEmbCold direct"
  *      SPARK_GRAFT_SF_DIR=<tier> sbt "runMain graft.DevEmbCold prescan"
  */
object DevEmbCold {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("direct")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      math.min(32, Runtime.getRuntime.availableProcessors()))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def kernel() = graft.ops.Similarity.cosineNearDupPairs(
      Tables.embeddings(spark, dir).select($"vec_id".as("id"), $"embedding"),
      thresholdQ = 3000L, numPlanes = 4, targetBucket = Some(512L))
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[embcold] $mode%-8s $label%-10s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    if (mode == "prescan")
      time("prescan") {
        // full decode of every embedding page, no kernel code touched
        Tables.embeddings(spark, dir)
          .select(sum(element_at($"embedding", 1))).collect()
      }
    time("run1")(kernel().agg(count(lit(1)), sum($"cos_q")).collect())
    time("run2")(kernel().agg(count(lit(1)), sum($"cos_q")).collect())
    time("run3")(kernel().agg(count(lit(1)), sum($"cos_q")).collect())
    spark.stop()
  }
}

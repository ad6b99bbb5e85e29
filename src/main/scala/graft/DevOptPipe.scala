package graft

import org.apache.spark.sql.functions._

/** Round-15 optimization probe: split a query's cost into DataFrame
  * CONSTRUCTION (driver: plan building + any eager work in the query
  * fn), physical PLANNING (analysis/optimization of the final action),
  * and EXECUTION (the bench's xxhash64-fold action) — guide §1/§7.3:
  * driver-side plan work is invisible in stage timelines but fully
  * inside the bench's timed region.
  *
  * Usage: runMain graft.DevOptPipe q_fia_incremental ...
  */
object DevOptPipe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      math.min(32, Runtime.getRuntime.availableProcessors()))
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_fia_incremental")
    def clearState(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 3).foreach { i =>
        clearState()
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        val forced = df.select(xxhash64(struct(df.columns.map(col): _*)).as("__h"))
          .agg(expr("bit_xor(__h)"))
        forced.queryExecution.executedPlan
        val t2 = System.nanoTime()
        forced.collect()
        val t3 = System.nanoTime()
        println(f"[optpipe] $name%-24s run$i construct ${(t1 - t0) / 1e9}%6.2f s  plan ${(t2 - t1) / 1e9}%6.2f s  exec ${(t3 - t2) / 1e9}%6.2f s")
      }
    }
    spark.stop()
  }
}

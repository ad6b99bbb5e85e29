package graft

/** Scratch per-query timing main (dev only): runs the named queries
  * twice in one JVM to split plan/codegen cost from steady-state exec.
  * Usage: runMain graft.DevTime q_exact_dedup q_star_join ...
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_exact_dedup")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        println(f"[devtime] $name%-24s run$i ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
      }
    }
    spark.stop()
  }
}

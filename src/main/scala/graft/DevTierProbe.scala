package graft

/** Throwaway probe for the round-11 scale-tier flags: run a named
  * bench query at an arbitrary sf dir with timing + formatted plan. */
object DevTierProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val names = args.drop(1)
    val spark = GraftSession.local(
      math.min(32, Runtime.getRuntime.availableProcessors()))
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      val df = fn(spark, dir)
      if (sys.env.contains("PROBE_EXPLAIN")) df.explain("formatted")
      val t0 = System.nanoTime()
      val cnt = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $n rows=$cnt time=$dt%.2f s (count action)")
      val t1 = System.nanoTime()
      import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      println(f"[probe] $n hash-action time=${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Scratch CC-round profiling main (dev only). */
object DevCc {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    for (run <- 1 to 2) {
      val pairs = time(s"run$run pairs") {
        val p = graft.ops.Dedup.minHashLshPairs(
          Tables.documents(spark, dir).filter($"doc_id" < 2000),
          "doc_id", "text", numPerms = 6, bandSize = 3, threshold = 0.8,
          maxBucket = Some(100)).localCheckpoint(true)
        println(s"pairs: ${p.count()}"); p
      }
      val dirE = pairs.select(col("i").as("a"), col("j").as("b"))
      val sym = dirE.union(dirE.select(col("b").as("a"), col("a").as("b")))
      val adj = time(s"run$run adj") {
        sym.union(sym.select(col("a"), col("a").as("b")))
          .distinct().repartition(col("b")).localCheckpoint(true)
      }
      var labels = time(s"run$run labels0") {
        adj.filter(col("a") === col("b"))
          .select(col("a").as("node"), col("a").as("lab")).localCheckpoint(true)
      }
      var converged = false
      var i = 0
      while (!converged && i < 25) {
        val next = time(s"run$run round$i agg+ck") {
          adj.join(labels, adj("b") === labels("node"))
            .select(adj("a").as("node"), col("lab"),
              (adj("a") === adj("b")).as("self"))
            .groupBy("node")
            .agg(min("lab").as("lab"),
              max(when(col("self"), col("lab"))).as("old"))
            .localCheckpoint(true)
        }
        converged = time(s"run$run round$i probe") {
          next.filter(col("lab") =!= col("old")).limit(1).count() == 0L
        }
        labels = next.select("node", "lab")
        i += 1
      }
      println(s"[profile] run$run rounds=$i")
    }
    spark.stop()
  }
}

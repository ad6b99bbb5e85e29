package graft

import org.apache.spark.sql.functions._

/** Scratch profiling main (dev only). */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables.documents(spark, dir)
    println(s"docs rows: ${docs.count()}")
    val t = time("tokens")(graft.ops.Dedup.tokens(docs, "doc_id", "text").cache())
    println(s"tokens: ${t.count()}")
    val sig = time("signatures") {
      val s = graft.ops.Dedup.minHashSignatures(docs, "doc_id", "text", 6).cache()
      s.count(); s
    }
    val bands = time("bands") {
      val b = sig
        .withColumn("band", (col("p") / 2).cast("int"))
        .groupBy(col("id"), col("band"))
        .agg(concat_ws("_",
          max(when(col("p") % 2 === 0, col("mh"))),
          max(when(col("p") % 2 === 1, col("mh")))).as("band_sig"))
        .cache()
      b.count(); b
    }
    val cand = time("candidates") {
      val l = bands.as("l"); val r = bands.as("r")
      val c = l.join(r,
        col("l.band") === col("r.band") && col("l.band_sig") === col("r.band_sig") &&
          col("l.id") < col("r.id"))
        .select(col("l.id").as("i"), col("r.id").as("j"))
        .distinct().cache()
      println(s"candidates: ${c.count()}"); c
    }
    time("full pipeline") {
      println("pairs: " + graft.ops.Dedup
        .minHashLshPairs(docs, "doc_id", "text", 6, 2, 0.7).count())
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Scratch bisect of q_contamination cost (dev only). */
object DevContam {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val d = Tables.documents(spark, dir)
    import spark.implicits._
    val corpus = d.filter($"doc_id" >= 100)
    val bench = d.filter($"doc_id" < 100)
    time("corpus ngrams count") {
      println(graft.ops.Dedup.ngramTokens(corpus, "doc_id", "text", 8).count())
    }
    time("bench ngrams distinct") {
      println(graft.ops.Dedup.ngramTokens(bench, "doc_id", "text", 8)
        .select($"tok").distinct().count())
    }
    time("join no-broadcast") {
      val bg = graft.ops.Dedup.ngramTokens(bench, "doc_id", "text", 8)
        .select($"tok").distinct()
      println(graft.ops.Dedup.ngramTokens(corpus, "doc_id", "text", 8)
        .join(bg, "tok").groupBy($"id").agg(count(lit(1))).count())
    }
    time("full op (broadcast)") {
      println(graft.ops.Dedup.ngramContamination(corpus, bench, "doc_id", "text", 8).count())
    }
    spark.stop()
  }
}

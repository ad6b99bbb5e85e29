package graft

import org.apache.spark.sql.functions._

object DevSubstrProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    for (k <- Seq(1, 10, 30)) {
      val dir = s"/tmp/graft_scale_${k}x"
      val t0 = System.nanoTime()
      val row = graft.ops.Dedup.removeDuplicateSpans(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", 8)
        .agg(sum(length(col("dedup_text"))).as("chars"),
          sum(col("n_kept")).as("kept"), sum(col("n_toks")).as("toks"))
        .collect()(0)
      println(s"[substr] k=$k chars=${row.getLong(0)} kept=${row.getLong(1)} " +
        s"toks=${row.getLong(2)} sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}

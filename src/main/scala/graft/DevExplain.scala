package graft

/** Dumps physical plans for representative queries (dev tool; output
  * reviewed into docs/PLANS.md). */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = "/root/testdata/sf0.01"
    val interesting = if (args.nonEmpty) args.toSeq else Seq(
      "q_filter_project", "q1_agg", "q_star_join", "q_range_join",
      "q_interp_linear", "q_pop_scale", "q_nsvb_volume", "q_cosine_topk", "q_topk",
      "q_winnow_fp", "q_ngram_jaccard", "q_minhash_lsh")
    interesting.foreach { name =>
      println(s"\n########## $name ##########")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}

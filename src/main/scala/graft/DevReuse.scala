package graft
object DevReuse {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q_tfidf", "q_fuzzy_pairs")) {
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      println(s"== $q reused=${"ReusedExchange".r.findAllIn(s).length} stages=${"ShuffleQueryStage".r.findAllIn(s).length} final=${s.contains("isFinalPlan=true")}")
    }
    spark.stop()
  }
}

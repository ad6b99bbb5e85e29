package graft

import org.apache.spark.sql.functions._

object DevNullTree {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val nPlots = sys.env.getOrElse("SPARK_GRAFT_NPLOTS", "180000").toInt
    val annual = spark.read.parquet(s"/tmp/graft_bktperf_stage_$nPlots")
    val total = annual.count()
    val nullTree = annual.filter(col("tree_ID").isNull).count()
    val maxTree = annual.groupBy("tree_ID").count()
      .agg(max("count")).collect()(0).getLong(0)
    println(s"[nulltree] total=$total nullTree=$nullTree maxPerTree=$maxTree")
    spark.stop()
  }
}

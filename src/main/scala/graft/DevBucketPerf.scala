package graft

import org.apache.spark.sql.functions._

/** Dev experiment (round-9): stage-split the BUCKETED pipeline path at
  * a given tier — where do the remaining seconds go after the bucketed
  * stage removed the window-chain re-sorts?
  * Usage: SPARK_GRAFT_NPLOTS=180000 runMain graft.DevBucketPerf
  */
object DevBucketPerf {
  def main(args: Array[String]): Unit = {
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import graft.fia._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bktperf] $label%-42s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val nPlots = sys.env.getOrElse("SPARK_GRAFT_NPLOTS", "180000").toInt
    val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS",
      (16 * nPlots / 6000).toString).toInt
    val tabs = SyntheticState.tables(spark, nPlots)
    val stage = s"/tmp/graft_bktperf_stage_$nPlots"

    for (round <- 1 to 2) {
      println(s"--- round $round (nPlots=$nPlots buckets=$buckets) ---")
      val tidy = Tidy.fiaTidy(tabs)
      val kernel = FiaAnnualize.expandInterpolate(spark, tidy)
      val tbl = s"graft_bktperf_annual_$nPlots"
      time("kernel + bucketed write") {
        graft.ops.Layout.writeBucketed(
          kernel, tbl, stage, "tree_ID", buckets, Some("YEAR"))
      }
      val annual = spark.table(tbl)
      val mid0 = FiaAnnualize.adjustMortality(annual, useMortyr = false)
      val mor0 = FiaAnnualize.adjustMortality(annual, useMortyr = true)
      time("adjust midpt only (count)")(mid0.count())
      time("adjust mortyr only (count)")(mor0.count())
      val mid = Ids.splitCompositeIds(EstimateCarbon.fiaEstimate(spark, mid0))
      val mor = Ids.splitCompositeIds(EstimateCarbon.fiaEstimate(spark, mor0))
      time("variant midpt full (count)")(mid.count())
      time("variant mortyr full (count)")(mor.count())
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Dev bisect (round-9): inside the bucketed pipeline at 30×, the
  * mortyr FULL variant costs ~90 s while midpt costs ~7 s and the
  * mortyr window chain alone costs 0.3 s — where inside fiaEstimate
  * does the gap open, and do the two variants push different row
  * counts through the Brent UDF?
  */
object DevMortyrBisect {
  def main(args: Array[String]): Unit = {
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import graft.fia._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bisect] $label%-46s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val nPlots = sys.env.getOrElse("SPARK_GRAFT_NPLOTS", "180000").toInt
    val tabs = SyntheticState.tables(spark, nPlots)
    val stage = s"/tmp/graft_bktperf_stage_$nPlots"
    val tbl = s"graft_bktperf_annual_$nPlots"
    if (!spark.catalog.tableExists(tbl)) {
      graft.ops.Layout.writeBucketed(
        FiaAnnualize.expandInterpolate(spark, Tidy.fiaTidy(tabs)),
        tbl, stage, "tree_ID", 16 * nPlots / 6000, Some("YEAR"))
    }
    val annual = spark.table(tbl)

    for (variant <- Seq("midpt", "mortyr")) {
      println(s"--- $variant ---")
      val adj = FiaAnnualize.adjustMortality(annual, useMortyr = variant == "mortyr")
      val prepped = EstimateCarbon.prepCarbon(spark, adj)
      time("prepCarbon count")(println("  rows=" + prepped.count()))
      val est = EstimateCarbon.estimateCarbon(spark, prepped)
      time("estimateCarbon full count")(est.count())

      // hypothesis: expression-tree blowup across the window-derived
      // STATUSCD rewrite — a LOGICAL RE-ROOT after adjustMortality
      // should collapse the cost if so
      val adjR = spark.createDataFrame(adj.rdd, adj.schema)
      val preppedR = EstimateCarbon.prepCarbon(spark, adjR)
      time("RE-ROOTED prepCarbon count")(preppedR.count())
      val estR = EstimateCarbon.estimateCarbon(spark, preppedR)
      time("RE-ROOTED estimateCarbon full count")(estR.count())

      // and codegen size probe: how big is the generated code?
      val plan = est.queryExecution.executedPlan.toString
      println(s"  plan nodes≈${plan.linesIterator.size} windows=${"Window".r.findAllIn(plan).size} sorts=${"Sort ".r.findAllIn(plan).size} exchanges=${"Exchange".r.findAllIn(plan).size}")
    }
    spark.stop()
  }
}

package graft

import graft.fia._

/** Dev: where does the estimate DAG spend time — analysis or execution? */
object DevNsvbTime {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[nsvb] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val tables = Ingest.load(spark, "src/test/resources/fixture", Seq("XX"))
    val tidy = time("tidy build+run") { val t = Tidy.fiaTidy(tables).cache(); t.count(); t }
    val interp = time("kernel build+run") {
      val i = FiaAnnualize.expandInterpolate(spark, tidy).cache(); i.count(); i
    }
    val midpt = time("adjust build+run") {
      val m = FiaAnnualize.adjustMortality(interp, useMortyr = false).cache(); m.count(); m
    }
    val est = time("estimate build (lazy)") { EstimateCarbon.fiaEstimate(spark, midpt) }
    time("estimate analyze") { est.queryExecution.optimizedPlan }
    time("estimate execute") { est.count() }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Round-15 probe: where does q_fia_pipeline_oracle's CONSTRUCT phase
  * go, leg by leg (materialize / tidy+kernel plan / bucketed stage
  * write / variant chain analysis), and the same for the incremental
  * twin. Usage: runMain graft.DevOptPipe2 */
object DevOptPipe2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      math.min(32, Runtime.getRuntime.availableProcessors()))
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.fia._
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[optpipe2] $label%-36s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    def clearState(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      clearState()
      val base = t("materialize")(SyntheticState.materialize(spark, dir))
      val ts = Seq("PLOT", "PLOTGEOM", "COND", "TREE")
        .map(n => n -> spark.read.parquet(s"$base/$n")).toMap
      val tidy = t("tidy construct")(Tidy.fiaTidy(ts))
      val interpolated = t("kernel construct")(FiaAnnualize.expandInterpolate(spark, tidy))
      val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val stageDir = s"$base/annual_stage"
      val tbl = s"graft_pipeline_annual_${math.abs(stageDir.hashCode)}"
      t("writeBucketed (kernel exec+write)")(
        graft.ops.Layout.writeBucketed(interpolated, tbl, stageDir, "tree_ID", n, Some("YEAR")))
      val annual = spark.table(tbl)
      val m0 = t("variant midpt construct")(
        Ids.splitCompositeIds(EstimateCarbon.fiaEstimate(
          spark, FiaAnnualize.adjustMortality(annual, useMortyr = false))))
      val m1 = t("variant mortyr construct")(
        Ids.splitCompositeIds(EstimateCarbon.fiaEstimate(
          spark, FiaAnnualize.adjustMortality(annual, useMortyr = true))))
      val u = t("union construct")(
        m0.withColumn("variant", lit("midpt"))
          .unionByName(m1.withColumn("variant", lit("mortyr"))))
      t("exec (hash action)") {
        val f = u.select(xxhash64(struct(u.columns.map(col): _*)).as("__h"))
          .agg(expr("bit_xor(__h)"))
        f.collect()
      }
    }
    spark.stop()
  }
}

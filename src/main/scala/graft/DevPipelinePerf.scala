package graft

import org.apache.spark.sql.functions._

/** Dev experiment (round-8): where do q_fia_pipeline_oracle's ~10 s go,
  * and does swapping the kernel-reuse point from persist() to
  * localCheckpoint(eager) shrink them? localCheckpoint truncates the
  * LOGICAL plan too, so the two mortality variants analyze/codegen over
  * a leaf RDD scan instead of the full 14-column kernel subtree.
  * Usage: runMain graft.DevPipelinePerf
  */
object DevPipelinePerf {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.fia._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pipeperf] $label%-38s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val tabs = SyntheticState.tables(spark,
      sys.env.get("SPARK_GRAFT_NPLOTS").map(_.toInt)
        .getOrElse(SyntheticState.nPlotsFor(sfDir)))

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      // stage split: kernel alone, then the two variants from the cache
      val tidy = Tidy.fiaTidy(tabs)
      val kernel = FiaAnnualize.expandInterpolate(spark, tidy)
      val cached = kernel.persist()
      time("kernel only (persist+count)")(cached.count())
      val mid = Ids.splitCompositeIds(EstimateCarbon.fiaEstimate(spark,
        FiaAnnualize.adjustMortality(cached, useMortyr = false)))
      time("variant midpt from cache")(mid.count())
      val mor = Ids.splitCompositeIds(EstimateCarbon.fiaEstimate(spark,
        FiaAnnualize.adjustMortality(cached, useMortyr = true)))
      time("variant mortyr from cache")(mor.count())
      cached.unpersist(blocking = true)

      // A: shipped composition (persist, one union count)
      time("A persist() both-variants count") {
        val r = Pipeline.run(spark, tabs)
        r("midpt").withColumn("variant", lit("midpt"))
          .unionByName(r("mortyr").withColumn("variant", lit("mortyr"))).count()
      }
      spark.sharedState.cacheManager.clearCache()

      // B: localCheckpoint(eager) at the reuse point
      time("B localCheckpoint both-variants count") {
        val k = FiaAnnualize.expandInterpolate(spark, Tidy.fiaTidy(tabs))
          .localCheckpoint(true)
        val m0 = Ids.splitCompositeIds(EstimateCarbon.fiaEstimate(spark,
          FiaAnnualize.adjustMortality(k, useMortyr = false)))
        val m1 = Ids.splitCompositeIds(EstimateCarbon.fiaEstimate(spark,
          FiaAnnualize.adjustMortality(k, useMortyr = true)))
        m0.withColumn("variant", lit("midpt"))
          .unionByName(m1.withColumn("variant", lit("mortyr"))).count()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))

      // C: persist + EAGER materialization before the union action
      time("C eager-persist both-variants count") {
        val k = FiaAnnualize.expandInterpolate(spark, Tidy.fiaTidy(tabs)).persist()
        k.count() // populate the cache BEFORE the variants race over it
        val m0 = Ids.splitCompositeIds(EstimateCarbon.fiaEstimate(spark,
          FiaAnnualize.adjustMortality(k, useMortyr = false)))
        val m1 = Ids.splitCompositeIds(EstimateCarbon.fiaEstimate(spark,
          FiaAnnualize.adjustMortality(k, useMortyr = true)))
        m0.withColumn("variant", lit("midpt"))
          .unionByName(m1.withColumn("variant", lit("mortyr"))).count()
      }
      spark.sharedState.cacheManager.clearCache()

      // D: split the union action into plan-build vs execute, persist variant
      {
        val k = FiaAnnualize.expandInterpolate(spark, Tidy.fiaTidy(tabs)).persist()
        val m0 = Ids.splitCompositeIds(EstimateCarbon.fiaEstimate(spark,
          FiaAnnualize.adjustMortality(k, useMortyr = false)))
        val m1 = Ids.splitCompositeIds(EstimateCarbon.fiaEstimate(spark,
          FiaAnnualize.adjustMortality(k, useMortyr = true)))
        val u = m0.withColumn("variant", lit("midpt"))
          .unionByName(m1.withColumn("variant", lit("mortyr")))
        time("D union plan-build (executedPlan)")(u.queryExecution.executedPlan)
        time("D union execute (count)")(u.count())
        spark.sharedState.cacheManager.clearCache()
      }

      // E: persist + LOGICAL re-root (createDataFrame(rdd, schema)):
      // analyzer sees a leaf, RDD keeps lineage (fault-tolerant),
      // nothing eager
      time("E logical-reroot both-variants count") {
        val k = FiaAnnualize.expandInterpolate(spark, Tidy.fiaTidy(tabs)).persist()
        val kdf = spark.createDataFrame(k.rdd, k.schema)
        val m0 = Ids.splitCompositeIds(EstimateCarbon.fiaEstimate(spark,
          FiaAnnualize.adjustMortality(kdf, useMortyr = false)))
        val m1 = Ids.splitCompositeIds(EstimateCarbon.fiaEstimate(spark,
          FiaAnnualize.adjustMortality(kdf, useMortyr = true)))
        m0.withColumn("variant", lit("midpt"))
          .unionByName(m1.withColumn("variant", lit("mortyr"))).count()
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}

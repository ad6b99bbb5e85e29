package graft.fia

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end state pipeline (`scripts/state-parquet.R:10-49`):
  * load -> tidy -> annualize (midpt + mortyr variants) -> estimate ->
  * split ids -> parquet partitioned by STATECD. */
object Pipeline {

  /** Both mortality variants share the expensive expand+interpolate pass
    * (the reference docs call interpolate "the slowest step" — here it
    * runs once and both variants branch from it).
    *
    * The reuse point is persist() + a LOGICAL re-root
    * (`createDataFrame(cached.rdd, schema)`): the downstream stages are
    * ~60 sequential withColumn calls × 2 variants, and each call runs a
    * full analyzer pass over its input's logical plan — over the deep
    * kernel subtree that was ~6 s of driver-side analysis per
    * composition (measured, DevPipelinePerf round-8: 10.6 s → 6.4 s
    * end-to-end). Re-rooting puts a leaf under those chains so each
    * pass walks a small tree. Unlike localCheckpoint (same win), the
    * backing RDD KEEPS its lineage — an executor loss recomputes
    * through the cache instead of failing the job, which is the
    * property that matters on a real cluster. Values are identical;
    * the per-variant checksums (PipelineScaleSpec) and the composed
    * DuckDB oracle pin that. */
  def run(spark: SparkSession, tables: Map[String, DataFrame]): Map[String, DataFrame] = {
    val tidy = Tidy.fiaTidy(tables)
    val interpolated = FiaAnnualize.expandInterpolate(spark, tidy)
    // reuse the kernel output for both variants
    val cached = interpolated.persist()
    val reroot = spark.createDataFrame(cached.rdd, cached.schema)
    val midpt = FiaAnnualize.adjustMortality(reroot, useMortyr = false)
    val mortyr = FiaAnnualize.adjustMortality(reroot, useMortyr = true)
    Map(
      "midpt" -> Ids.splitCompositeIds(EstimateCarbon.fiaEstimate(spark, midpt)),
      "mortyr" -> Ids.splitCompositeIds(EstimateCarbon.fiaEstimate(spark, mortyr)))
  }

  def writeParquet(results: Map[String, DataFrame], outDir: String): Unit =
    results.foreach { case (variant, df) =>
      df.write.mode("overwrite")
        .partitionBy("STATECD")
        .parquet(s"$outDir/variant=$variant")
    }
}

package graft.fia

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end state pipeline (`scripts/state-parquet.R:10-49`):
  * load -> tidy -> annualize (midpt + mortyr variants) -> estimate ->
  * split ids -> parquet partitioned by STATECD. */
object Pipeline {

  /** Both mortality variants share the expensive expand+interpolate pass
    * (the reference docs call interpolate "the slowest step" — here it
    * runs once and both variants branch from it). */
  def run(spark: SparkSession, tables: Map[String, DataFrame]): Map[String, DataFrame] = {
    val tidy = Tidy.fiaTidy(tables)
    val interpolated = FiaAnnualize.expandInterpolate(spark, tidy)
    // reuse the kernel output for both variants
    val cached = interpolated.persist()
    val midpt = FiaAnnualize.adjustMortality(cached, useMortyr = false)
    val mortyr = FiaAnnualize.adjustMortality(cached, useMortyr = true)
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

package graft.fia

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Population scaling of the annualized+estimated table to state-level
  * per-area carbon (`vignettes/pop_scaling.qmd:98-166`): domain
  * indicators, a computed per-year expansion factor (the FIA-provided
  * EXPNS is wrong for annualized data — more plots per year), plot-level
  * tree and area totals, and the yearly rollup ratio.
  *
  * R `sum(x, na.rm = TRUE)` over all-NA groups is 0, hence the
  * `coalesce(sum(...), 0)` wrappers (SURVEY §7.4.2). The per-year
  * distinct-plot count is computed once and broadcast back rather than
  * windowed over the fact table.
  */
object PopScale {

  /** @param estimated output of [[EstimateCarbon.fiaEstimate]]
    * @param stateArea total state acres (e.g. RI = 781730.1) */
  def carbonPerAcre(estimated: DataFrame, stateArea: Double): DataFrame = {
    val dom = estimated
      .withColumn("aDI",
        when(col("COND_STATUS_CD") === 1 && col("INTENSITY") === 1, 1).otherwise(0))
      .withColumn("tDI",
        when(col("STATUSCD") === 1, 1).otherwise(0) * col("aDI"))

    val nPlots = dom.groupBy(col("YEAR"))
      .agg(countDistinct(col("plot_ID")).as("n_plots"))
    val withExpns = dom.join(broadcast(nPlots), Seq("YEAR"))
      .withColumn("EXPNS", lit(stateArea) / col("n_plots"))

    val treeTotals = withExpns
      .groupBy(col("plot_ID"), col("YEAR"))
      .agg(coalesce(
        sum(col("CARBON_AG") * col("TPA_UNADJ") * col("EXPNS") * col("tDI") / 2000),
        lit(0.0)).as("carbPlot"))

    val areaTotals = withExpns
      .select(col("plot_ID"), col("YEAR"), col("CONDID"), col("COND_STATUS_CD"),
        col("CONDPROP_UNADJ"), col("EXPNS"), col("aDI"))
      .distinct()
      .groupBy(col("plot_ID"), col("YEAR"))
      .agg(coalesce(
        sum(col("CONDPROP_UNADJ") * col("EXPNS") * col("aDI")), lit(0.0)).as("forArea"))

    treeTotals.join(areaTotals, Seq("plot_ID", "YEAR"))
      .groupBy(col("YEAR"))
      .agg(
        coalesce(sum(col("carbPlot")), lit(0.0)).as("carbon_total"),
        coalesce(sum(col("forArea")), lit(0.0)).as("AREA_TOTAL"))
      .withColumn("carbon_ton_acre", col("carbon_total") / col("AREA_TOTAL"))
  }
}

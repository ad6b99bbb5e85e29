package graft.fia

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Annualize, Fills}

/** `expand_data |> interpolate_data |> adjust_mortality`
  * (`R/expand_data.R`, `R/interpolate_data.R`, `R/adjust_mortality.R`)
  * — the annualization pipeline. The expand+interpolate pair runs as ONE
  * [[graft.ops.Annualize]] kernel pass (one shuffle for all 14 columns);
  * everything around it is DataFrame ops with broadcast reference joins.
  */
object FiaAnnualize {

  private val sentinelCols = Seq(
    "STATUSCD", "RECONCILECD", "DECAYCD", "STANDING_DEAD_CD",
    "STDORGCD", "CONDID", "COND_STATUS_CD")
  private val linearCols = Seq("ACTUALHT", "DIA", "HT", "CULL", "CR", "CONDPROP_UNADJ")
  private val stepCols = Seq("PLT_CN") ++ sentinelCols
  private val fillCols = Seq("INTENSITY", "SPCD", "ECOSUBCD", "DESIGNCD", "PROP_BASIS", "MORTYR")

  /** expand + interpolate (sentinel round-trip inside; `interpolated`
    * flag marks generated rows). */
  def expandInterpolate(spark: SparkSession, dataTidy: DataFrame): DataFrame = {
    // sentinel 999 in (R/expand_data.R:25-39): survey-year NAs must
    // step-interpolate as real values; CULL NA -> 0 for linear interp
    val pre = sentinelCols.foldLeft(dataTidy) { (d, c) =>
      if (d.columns.contains(c))
        d.withColumn(c, when(col(c).isNull, lit(999)).otherwise(col(c)))
      else d
    }.withColumn("CULL", when(col("CULL").isNull, lit(0.0)).otherwise(col("CULL")))

    val expanded = Annualize(
      pre.withColumnRenamed("INVYR", "YEAR"),
      Annualize.Config(
        keyCols = Seq("plot_ID", "tree_ID"),
        yearCol = "YEAR",
        linearCols = linearCols.filter(pre.columns.contains),
        stepCols = stepCols.filter(pre.columns.contains),
        fillDownUpCols = fillCols.filter(pre.columns.contains)))

    // sentinel out (R/interpolate_data.R:62-68); CULL only for DIA >= 5
    val decoded = sentinelCols.foldLeft(expanded) { (d, c) =>
      if (d.columns.contains(c))
        d.withColumn(c, when(col(c) === 999, lit(null)).otherwise(col(c)))
      else d
    }.withColumn("CULL", when(col("DIA") < 5, lit(null)).otherwise(col("CULL")))

    // TPA range join (equi on DESIGNCD + [min_DIA, max_DIA) residual;
    // 30-row broadcast -> BroadcastHashJoin, no shuffle)
    val rules = RefData.tpaRules(spark)
    val withTpa = decoded.join(
      broadcast(rules),
      decoded("DESIGNCD") === rules("DESIGNCD") &&
        decoded("DIA") >= rules("min_DIA") && decoded("DIA") < rules("max_DIA"),
      "left")
      .drop(rules("DESIGNCD")).drop("min_DIA", "max_DIA")

    // below-measurability threshold rewrite (R/interpolate_data.R:92-110)
    val refSp = RefData.refSpecies(spark)
      .select(col("SPCD").cast(IntegerType).as("SPCD"), col("JENKINS_SPGRPCD"))
    val withJk = withTpa.join(broadcast(refSp), Seq("SPCD"), "left")
    val deadFallen =
      (col("JENKINS_SPGRPCD") < 10 &&
        (col("DIA") < 1 || col("HT") < 4.5 || col("ACTUALHT") < 4.5)) ||
        (col("JENKINS_SPGRPCD") === 10 &&
          (col("DIA") < 1 || col("HT") < 1 || col("ACTUALHT") < 1))
    withJk
      .withColumn("STATUSCD", when(deadFallen, lit(2)).otherwise(col("STATUSCD")))
      .withColumn("STANDING_DEAD_CD", when(deadFallen, lit(0)).otherwise(col("STANDING_DEAD_CD")))
      .drop("JENKINS_SPGRPCD")
  }

  /** `adjust_mortality(use_mortyr)` (`R/adjust_mortality.R:24-129`). */
  def adjustMortality(dataInterpolated: DataFrame, useMortyr: Boolean = true): DataFrame = {
    val hasMortyr = useMortyr &&
      !dataInterpolated.filter(col("MORTYR").isNotNull).isEmpty

    val w = Window.partitionBy(col("tree_ID"))
    val df =
      if (hasMortyr) {
        dataInterpolated
          .withColumn("MORTYR_eff",
            when(col("YEAR") === col("MORTYR") && col("STATUSCD") === 1,
              col("MORTYR") + 1).otherwise(col("MORTYR")))
          .withColumn("MORTYR_eff", max(col("MORTYR_eff")).over(w))
          .withColumn("first_dead",
            min(when(col("STATUSCD") === 2, col("YEAR"))).over(w))
          .withColumn("STATUSCD",
            when(col("MORTYR_eff").isNull, col("STATUSCD"))
              .when(col("MORTYR_eff") === col("first_dead"), col("STATUSCD"))
              .when(col("MORTYR_eff") < col("first_dead") &&
                col("YEAR") >= col("MORTYR_eff") && col("YEAR") < col("first_dead"), lit(2))
              .when(col("MORTYR_eff") > col("first_dead") &&
                col("YEAR") < col("MORTYR_eff") && col("YEAR") >= col("first_dead"), lit(1))
              .otherwise(col("STATUSCD")))
          .transform(d =>
            Fills.fillUp(d, Seq("tree_ID"), Seq(col("YEAR")),
              Seq("DECAYCD", "STANDING_DEAD_CD")))
          .drop("first_dead", "MORTYR_eff")
      } else dataInterpolated

    val measured = Seq("DIA", "HT", "ACTUALHT", "CULL", "CR")
    // R %in% returns FALSE for NA (Spark isin yields null -> coalesce)
    val nonSampled =
      (col("STATUSCD") === 0 &&
        coalesce(col("RECONCILECD").isin(5, 6, 9), lit(false))) ||
        (col("COND_STATUS_CD") =!= 1)

    // masking in dependency WAVES (each withColumn re-analyzes the
    // whole post-kernel plan, so batch what is independent): DECAYCD
    // reads the REWRITTEN STANDING_DEAD_CD, and the non-sampled wave
    // reads the fallen wave's outputs — 12 analyzer passes become 4
    df
      // STANDING_DEAD_CD only for dead trees (null STATUSCD -> null)
      .withColumn("STANDING_DEAD_CD",
        when(col("STATUSCD") === 2, col("STANDING_DEAD_CD")))
      // DECAYCD only for standing dead (post-rewrite value)
      .withColumn("DECAYCD",
        when(col("STANDING_DEAD_CD") === 1, col("DECAYCD")))
      // fallen trees: no measurements (null condition keeps value,
      // mirroring if_else(cond, NA, x, missing = x))
      .withColumns(Map(measured.map(c0 => c0 ->
        when(col("STANDING_DEAD_CD") === 0, lit(null)).otherwise(col(c0))): _*))
      // non-sampled conditions: no measurements
      .withColumns(Map(measured.map(c0 => c0 ->
        when(nonSampled, lit(null)).otherwise(col(c0))): _*))
  }

  /** `fia_annualize()` (`R/fia_annualize.R:29-34`). */
  def annualize(spark: SparkSession, dataTidy: DataFrame, useMortyr: Boolean = true): DataFrame =
    adjustMortality(expandInterpolate(spark, dataTidy), useMortyr)
}

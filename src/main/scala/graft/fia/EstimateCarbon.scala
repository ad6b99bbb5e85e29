package graft.fia

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `fia_estimate()` = `prep_carbon()` + `estimate_carbon()`
  * (`R/prep_carbon.R:11-95`, `R/estimate_carbon.R:2-107`): reference
  * joins, NSVB prerequisites, the predictCRM2 DAG, and the re-attach of
  * DRYBIO_AG/CARBON_AG onto the full annualized table. All reference
  * tables broadcast; the fact table shuffles only at the final re-attach
  * join (and that one co-partitions with downstream per-tree use).
  */
object EstimateCarbon {

  /** R `if_else(cond, yes, no)` — null condition yields null
    * (dplyr's `missing` defaults to NA). */
  private def ifElse(cond: Column, yes: Column, no: Column): Column =
    when(cond, yes).when(!cond, no)

  /** `prep_carbon()` — reference joins + Walker-code prerequisites. */
  def prepCarbon(spark: SparkSession, dataMortyr: DataFrame): DataFrame = {
    val refSp = RefData.refSpecies(spark)
      .select(col("SPCD").cast(IntegerType).as("SPCD"), col("JENKINS_SPGRPCD"),
        col("SFTWD_HRDWD"), col("CARBON_RATIO_LIVE"), col("WDSG"))
    val decay = RefData.decayProp(spark)
    val cullRatio = decay.filter(col("DECAYCD") === 3)
      .select(col("SFTWD_HRDWD"), col("DENSITY_PROP").as("CULL_DECAY_RATIO"))
    val deadRatio = RefData.carbonRatioDead(spark)

    // ONE withColumns wave: every derivation reads only join outputs /
    // unmodified inputs (no column reads another wave member), and each
    // withColumn call re-analyzes the whole post-kernel plan — batched,
    // the analyzer walks it once instead of ten times per variant
    dataMortyr
      .join(broadcast(refSp), Seq("SPCD"), "left")
      .join(broadcast(cullRatio), Seq("SFTWD_HRDWD"), "left")
      .join(broadcast(decay), Seq("DECAYCD", "SFTWD_HRDWD"), "left")
      .join(broadcast(deadRatio), Seq("DECAYCD", "SFTWD_HRDWD"), "left")
      .withColumns(Map(
        "CULL_DECAY_RATIO" ->
          ifElse(col("STATUSCD") === 1, col("CULL_DECAY_RATIO"), lit(1.0)),
        "STANDING_DEAD_CD" ->
          ifElse(col("STATUSCD") === 1, lit(0), col("STANDING_DEAD_CD")),
        "DECAYCD" -> ifElse(col("STATUSCD") === 1, lit(0), col("DECAYCD")),
        "DECAY_WD" -> ifElse(col("STATUSCD") === 1, lit(1.0), col("DENSITY_PROP")),
        "DECAY_BK" -> ifElse(col("STATUSCD") === 1, lit(1.0), col("BARK_LOSS_PROP")),
        "DECAY_BR" -> ifElse(col("STATUSCD") === 1, lit(1.0), col("BRANCH_LOSS_PROP")),
        "C_FRAC" -> ifElse(col("STATUSCD") === 1,
          col("CARBON_RATIO_LIVE") * 100, col("CARBON_RATIO") * 100),
        "PROVINCE" -> Division.province(col("ECOSUBCD")),
        "DIVISION" -> Division.division(col("ECOSUBCD")),
        "CULL" -> when(col("CULL").isNull, lit(0.0)).otherwise(col("CULL"))))
  }

  /** `estimate_carbon()` — crown-ratio join + prerequisites +
    * predictCRM2 + re-attach. */
  def estimateCarbon(spark: SparkSession, dataPrepped: DataFrame): DataFrame = {
    val medCr = RefData.medianCrProp(spark)
      .withColumn("SFTWD_HRDWD", when(col("hwd_yn") === "N", lit("S")).otherwise(lit("H")))
      .select(col("Province").as("PROVINCE"), col("SFTWD_HRDWD"), col("CRmn"))
    val (missSft, missHwd) = RefData.crPropDefaults

    // three dependency WAVES (not one): SPCD reads the wave-1 STDORGCD
    // rewrite, and SPCD_DIVISION reads the wave-2 SPCD string — within
    // a wave every expression evaluates against the wave's INPUT
    val fiadb0 = dataPrepped
      .filter(col("JENKINS_SPGRPCD") < 10 && col("HT").isNotNull)
      .join(broadcast(medCr), Seq("SFTWD_HRDWD", "PROVINCE"), "left")
      .withColumns(Map(
        "CRmn" -> when(col("CRmn").isNull && col("SFTWD_HRDWD") === "S", lit(missSft))
          .when(col("CRmn").isNull && col("SFTWD_HRDWD") === "H", lit(missHwd))
          .otherwise(col("CRmn")),
        "BROKEN_TOP" -> !(col("HT") === col("ACTUALHT")),
        "CR" -> when(col("CR").isNull && col("STATUSCD") === 1, lit(0.0))
          .otherwise(col("CR")),
        "STDORGCD" -> when(col("STDORGCD").isNull, lit(0)).otherwise(col("STDORGCD")),
        "CULL" -> when(col("CULL").isNull, lit(0.0)).otherwise(col("CULL")),
        "DBH" -> col("DIA"),
        "THT" -> col("HT")))
      // planted loblolly/slash -> separate coefficient rows ("1_131");
      // SPCD becomes a string from here on (SURVEY §7.4.9)
      .withColumn("SPCD",
        when(col("SPCD").isin(111, 131) && col("STDORGCD") === 1,
          concat(lit("1_"), col("SPCD").cast(StringType)))
          .otherwise(col("SPCD").cast(StringType)))
      // R paste() renders NA as the string "NA"
      .withColumn("SPCD_DIVISION",
        concat(col("SPCD"), lit(" "), coalesce(col("DIVISION"), lit("NA"))))

    val predicted = Nsvb.predict(spark, fiadb0)
      .select(col("plot_ID").as("plot_ID_p"), col("tree_ID").as("tree_ID_p"),
        col("YEAR").as("YEAR_p"),
        col("BIOMASS").as("DRYBIO_AG"), col("CARBON").as("CARBON_AG"))

    // Plain === on tree_ID, NOT <=> (the reference's NA-matching J13):
    // `predicted` descends from the `HT IS NOT NULL` filter above,
    // which excludes every empty-plot (null-tree_ID) row, so the two
    // operators are value-identical here — a null left key matches
    // nothing either way. The difference is the PLAN: Catalyst
    // canonicalizes null-safe join keys as (coalesce(k,''), isnull(k)),
    // which a tree_ID-bucketed layout cannot satisfy, forcing both
    // sides of this corpus-sized self-join through an Exchange; raw
    // tree_ID keys let the bucketed distribution carry through with
    // in-partition sorts only (plan-audited in PLANS.md round-9).
    dataPrepped.join(predicted,
      dataPrepped("plot_ID") === predicted("plot_ID_p") &&
        dataPrepped("tree_ID") === predicted("tree_ID_p") &&
        dataPrepped("YEAR") === predicted("YEAR_p"),
      "left")
      .drop("plot_ID_p", "tree_ID_p", "YEAR_p")
  }

  /** `fia_estimate()` (`R/fia_estimate.R:20-24`). */
  def fiaEstimate(spark: SparkSession, data: DataFrame): DataFrame =
    estimateCarbon(spark, prepCarbon(spark, data))
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` demonstrates one operator family from
  * SURVEY.md §2 over the driver's testdata tables; `oracleSql` holds the
  * DuckDB-equivalent SQL the driver uses as a cross-engine oracle.
  *
  * Cross-engine exactness rules used throughout (the driver hash-compares
  * values, so results must match DuckDB bit-for-bit):
  *   - sums of doubles go through DECIMAL(18,x) so the summation is exact
  *     and order-independent, then one cast back to double;
  *   - sums of integral-valued doubles (e.g. l_quantity) are exact in
  *     binary doubles as-is;
  *   - per-row double arithmetic uses the same parenthesization in both
  *     engines (identical IEEE op sequence → identical bits).
  */
object SparkEntry {

  /** Flagship: the full reference pipeline (load -> tidy -> annualize ->
    * NSVB estimate) over the bundled synthetic state; driver smoke-checks
    * rows>0. Falls back to q1_agg if the fixture path is unavailable. */
  def entry(spark: SparkSession): DataFrame = {
    val fixture = "/root/repo/src/test/resources/fixture"
    if (new java.io.File(s"$fixture/XX_TREE.csv").exists()) {
      val tables = graft.fia.Ingest.load(spark, fixture, Seq("XX"))
      val tidy = graft.fia.Tidy.fiaTidy(tables)
      val annual = graft.fia.FiaAnnualize.annualize(spark, tidy, useMortyr = true)
      graft.fia.EstimateCarbon.fiaEstimate(spark, annual)
    } else {
      queries("q1_agg")(spark, "/root/testdata/sf0.001")
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all

  def oracleSql: Map[String, String] =
    Queries.oracles
}

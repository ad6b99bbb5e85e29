package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The declared query surface (driver correctness gate).
  *
  * One entry per operator family in SURVEY.md §2, expressed over the
  * driver's testdata tables. Spark side uses the graft library
  * operators; oracle side is independent ANSI SQL run by DuckDB.
  */
object Queries {

  /** Exact, order-independent sum of a double column: route through
    * decimal so Spark and DuckDB agree bit-for-bit. */
  private[graft] def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(28, scale))).cast(DoubleType)

  // ---------------------------------------------------------------
  // A: aggregation family
  // ---------------------------------------------------------------

  /** TPC-H Q1 shape — SURVEY §2.4 A3/A5 (grouped sums), §2.2 P1/P2. */
  private def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_quantity" > 0)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice", 2).as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
  }

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_quantity > 0
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _)
  ) ++ QueriesAnnualize.queries ++ QueriesCore.queries ++ QueriesAgg.queries ++ QueriesText.queries ++ QueriesVector.queries ++ QueriesEvents.queries ++ QueriesFia.queries ++ QueriesBench.queries ++ QueriesCorpus.queries ++ QueriesMedia.queries

  // def, not val: QueriesCorpus.oracles embeds the q_file_stats staging
  // path recorded at query run time — dump-time evaluation keeps it in
  // sync (Verify writes oracle_sql.json after the queries run).
  def oracles: Map[String, String] = Map(
    "q1_agg" -> q1Sql
  ) ++ QueriesAnnualize.oracles ++ QueriesCore.oracles ++ QueriesAgg.oracles ++ QueriesText.oracles ++ QueriesVector.oracles ++ QueriesEvents.oracles ++ QueriesFia.oracles ++ QueriesBench.oracles ++ QueriesCorpus.oracles ++ QueriesMedia.oracles
}

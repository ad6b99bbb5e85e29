package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Annualize

/** Gate queries for the annualization core (SURVEY §2.5 W3/W4, §2.3 J5).
  *
  * The testdata has no FIA panel, so we derive one deterministically:
  * per (customer, order-year) aggregates over `orders` form a sparse
  * per-entity time series with natural gaps — exactly the shape of the
  * reference's tree surveys. The Spark side runs the real library kernel
  * (`Annualize` / `Interp`); the DuckDB oracle re-derives the same
  * semantics independently with window SQL. Formulas use identical IEEE
  * op order on both sides, so the hash compare is exact.
  */
object QueriesAnnualize {

  /** Sparse panel: one row per (customer, year) with a measurement and a
    * categorical. max() aggregates are order-independent and exact. */
  private def panel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_custkey".as("id"), year($"o_orderdate").cast("int").as("yr"))
      .agg(max($"o_totalprice").as("m"), max($"o_orderpriority").as("cat"))
  }

  private val panelSql =
    """SELECT o_custkey AS id, CAST(year(o_orderdate) AS INT) AS yr,
      |       max(o_totalprice) AS m, max(o_orderpriority) AS cat
      |FROM orders GROUP BY 1, 2""".stripMargin

  /** J5: year densification — per-entity grid from min to max observed
    * year, generated rows flagged. Reference: R/expand_data.R:41-57. */
  def expandYears(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Annualize(
      panel(s, dir).select($"id", $"yr", $"m"),
      Annualize.Config(keyCols = Seq("id"), yearCol = "yr"))
  }

  val expandYearsSql: String =
    s"""WITH panel AS ($panelSql),
       |bounds AS (SELECT id, min(yr) AS miny, max(yr) AS maxy FROM panel GROUP BY id),
       |grid AS (SELECT id, CAST(unnest(generate_series(miny, maxy)) AS INT) AS yr FROM bounds)
       |SELECT grid.id, grid.yr, p.m, p.yr IS NULL AS interpolated
       |FROM grid LEFT JOIN panel p ON grid.id = p.id AND grid.yr = p.yr""".stripMargin

  /** W3: linear interpolation + extrapolation over a fixed 1995-2001 grid
    * (so leading/trailing gaps exercise the extrapolation and single-anchor
    * carry-forward paths). Reference: R/inter_extra_polate.R:31-61. */
  def interpLinear(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Annualize(
      panel(s, dir).select($"id", $"yr", $"m"),
      Annualize.Config(
        keyCols = Seq("id"), yearCol = "yr",
        linearCols = Seq("m"), range = Some((1995, 2001))))
      .select($"id", $"yr", $"m")
  }

  val interpLinearSql: String =
    s"""WITH panel AS ($panelSql),
       |anch AS (
       |  SELECT id, yr, m,
       |         row_number() OVER (PARTITION BY id ORDER BY yr) AS rn,
       |         count(*) OVER (PARTITION BY id) AS cnt
       |  FROM panel),
       |ext AS (
       |  SELECT id, max(cnt) AS cnt,
       |    max(CASE WHEN rn = 1 THEN yr END) AS x1, max(CASE WHEN rn = 1 THEN m END) AS y1,
       |    max(CASE WHEN rn = 2 THEN yr END) AS x2, max(CASE WHEN rn = 2 THEN m END) AS y2,
       |    max(CASE WHEN rn = cnt - 1 THEN yr END) AS xl2, max(CASE WHEN rn = cnt - 1 THEN m END) AS yl2,
       |    max(CASE WHEN rn = cnt THEN yr END) AS xl, max(CASE WHEN rn = cnt THEN m END) AS yl
       |  FROM anch GROUP BY id),
       |grid AS (SELECT id, CAST(unnest(generate_series(1995, 2001)) AS INT) AS yr FROM ext),
       |g AS (
       |  SELECT grid.id, grid.yr, p.m
       |  FROM grid LEFT JOIN panel p ON grid.id = p.id AND grid.yr = p.yr),
       |w AS (
       |  SELECT g.*,
       |    last_value(CASE WHEN m IS NOT NULL THEN yr END IGNORE NULLS)
       |      OVER (PARTITION BY id ORDER BY yr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS py,
       |    last_value(m IGNORE NULLS)
       |      OVER (PARTITION BY id ORDER BY yr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
       |    first_value(CASE WHEN m IS NOT NULL THEN yr END IGNORE NULLS)
       |      OVER (PARTITION BY id ORDER BY yr ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ny,
       |    first_value(m IGNORE NULLS)
       |      OVER (PARTITION BY id ORDER BY yr ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
       |  FROM g)
       |SELECT w.id, w.yr,
       |  CASE
       |    WHEN e.cnt = 1 THEN (CASE WHEN w.yr >= e.x1 THEN e.y1 END)
       |    WHEN w.m IS NOT NULL THEN w.m
       |    WHEN w.pv IS NULL THEN e.y1 + ((CAST(w.yr - e.x1 AS DOUBLE)) * (e.y2 - e.y1)) / CAST(e.x2 - e.x1 AS DOUBLE)
       |    WHEN w.nv IS NULL THEN e.yl + ((CAST(w.yr - e.xl AS DOUBLE)) * (e.yl - e.yl2)) / CAST(e.xl - e.xl2 AS DOUBLE)
       |    ELSE w.pv + (w.nv - w.pv) * (CAST(w.yr - w.py AS DOUBLE) / CAST(w.ny - w.py AS DOUBLE))
       |  END AS m
       |FROM w JOIN ext e USING (id)""".stripMargin

  /** W4: midpoint categorical switch over the same fixed grid.
    * Reference: R/step_interp.R:16-48. */
  def stepInterp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Annualize(
      panel(s, dir).select($"id", $"yr", $"cat"),
      Annualize.Config(
        keyCols = Seq("id"), yearCol = "yr",
        stepCols = Seq("cat"), range = Some((1995, 2001))))
      .select($"id", $"yr", $"cat")
  }

  val stepInterpSql: String =
    s"""WITH panel AS ($panelSql),
       |grid AS (
       |  SELECT id, CAST(unnest(generate_series(1995, 2001)) AS INT) AS yr
       |  FROM (SELECT DISTINCT id FROM panel)),
       |g AS (
       |  SELECT grid.id, grid.yr, p.cat
       |  FROM grid LEFT JOIN panel p ON grid.id = p.id AND grid.yr = p.yr),
       |w AS (
       |  SELECT g.*,
       |    last_value(CASE WHEN cat IS NOT NULL THEN yr END IGNORE NULLS)
       |      OVER (PARTITION BY id ORDER BY yr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS py,
       |    last_value(cat IGNORE NULLS)
       |      OVER (PARTITION BY id ORDER BY yr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
       |    first_value(CASE WHEN cat IS NOT NULL THEN yr END IGNORE NULLS)
       |      OVER (PARTITION BY id ORDER BY yr ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ny,
       |    first_value(cat IGNORE NULLS)
       |      OVER (PARTITION BY id ORDER BY yr ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
       |  FROM g)
       |SELECT id, yr,
       |  CASE
       |    WHEN pv IS NULL THEN NULL
       |    WHEN nv IS NULL THEN pv
       |    WHEN 2 * (yr - py) < ny - py THEN pv
       |    ELSE nv
       |  END AS cat
       |FROM w""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_expand_years" -> (expandYears _),
    "q_interp_linear" -> (interpLinear _),
    "q_step_interp" -> (stepInterp _))

  val oracles: Map[String, String] = Map(
    "q_expand_years" -> expandYearsSql,
    "q_interp_linear" -> interpLinearSql,
    "q_step_interp" -> stepInterpSql)
}

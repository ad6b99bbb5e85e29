package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-flight data-quality counters via `Dataset.observe`: metrics are
  * accumulated by the SAME job that does the real work — at 100 TB a
  * separate "count the nulls" pass re-reads the whole table, while an
  * observation rides the existing scan for free (per-partition partial
  * aggregation into driver-merged accumulators).
  *
  * Use: attach before the sink action, read the map after it completes.
  * {{{
  *   val (out, obs) = Quality.observed(df, "curate",
  *     Quality.rowCount, Quality.nullCount("text"))
  *   out.write.parquet(path)
  *   val metrics = obs.get   // Map(n_rows -> ..., n_null_text -> ...)
  * }}}
  */
object Quality {

  def rowCount: Column = count(lit(1)).as("n_rows")

  def nullCount(c: String): Column =
    count(when(col(c).isNull, 1)).as(s"n_null_$c")

  def belowLength(c: String, min: Int): Column =
    count(when(length(col(c)) < min, 1)).as(s"n_short_$c")

  def distinctApprox(c: String): Column =
    approx_count_distinct(col(c)).as(s"n_distinct_$c")

  /** Attach observation metrics; the caller runs the action and then
    * reads `observation.get`. */
  def observed(df: DataFrame, name: String, metrics: Column*): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "at least one metric")
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Exact profile of several numeric columns — the ingest gate's
    * schema-health report: per column, row count, null count, EXACT
    * distinct count, min, max, and a decimal-exact sum. Output is
    * long-format (one row per column) so downstream checks are data,
    * not schema.
    *
    * Shape: one TWO-LEVEL aggregation per column over a column-pruned
    * scan, unioned. The earlier one-scan form combined all the
    * `count(DISTINCT …)`s in a single agg, which Catalyst plans
    * through Expand — every input row is fanned to (N distinct cols +
    * 1) copies BEFORE the partial aggregate, so the hash-aggregate
    * stream is N+1× the table and the whole profile rode one 5×-wide
    * pass (41 s warm at the 100× tier, the heaviest genuine curve in
    * the round-13 scale chain). Per-column branches instead read ONE
    * column each — columnar parquet makes N single-column scans the
    * same total I/O as one N-column scan — and shuffle only each
    * column's (value, count, partial-sum) groups after map-side
    * combine: the exchange is bounded by per-column cardinality, not
    * N+1× the row count, and the N branches schedule concurrently
    * within the one job. Same results bit-for-bit (the per-group
    * decimal partial sums re-aggregate to the identical
    * decimal(38,4) total the flat sum produced). */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    val perCol = cols.map { c =>
      // project FIRST so a fired single-split spread moves only this
      // column ([[Spread.toCores]]); on a multi-split table the branch
      // is a bare one-column scan
      val src = Spread.toCores(df.select(col(c).as("__v")))
      src.groupBy(col("__v"))
        .agg(
          count(lit(1)).as("__cnt"),
          sum(col("__v").cast("decimal(28,4)")).as("__gsum"))
        .agg(
          coalesce(sum(when(col("__v").isNotNull, col("__cnt"))), lit(0L))
            .as("n_values"),
          coalesce(sum(when(col("__v").isNull, col("__cnt"))), lit(0L))
            .as("n_nulls"),
          count(when(col("__v").isNotNull, lit(1))).as("n_distinct"),
          min(col("__v")).cast("double").as("min_v"),
          max(col("__v")).cast("double").as("max_v"),
          sum(col("__gsum")).cast("double").as("sum_v"))
        .select(lit(c).as("column"), col("n_values"), col("n_nulls"),
          col("n_distinct"), col("min_v"), col("max_v"), col("sum_v"))
    }
    perCol.reduce(_ unionAll _)
  }
}

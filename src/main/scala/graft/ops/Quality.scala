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

  /** One-PASS exact profile of several numeric columns — the ingest
    * gate's schema-health report: per column, row count, null count,
    * EXACT distinct count, min, max, and a decimal-exact sum. All
    * columns profile in a single aggregation over one scan (the
    * multi-`count(DISTINCT …)` combination plans through Catalyst's
    * Expand — one pass over the data fanned to one stream per distinct
    * aggregate, partial-aggregated; a naive per-column loop would scan
    * the table N times). Output is long-format (one row per column) so
    * downstream checks are data, not schema. */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    // the multi-distinct Expand multiplies the stream BEFORE the
    // partial aggregate — on a single-split source that whole fan-out
    // would run on one core ([[Spread.toCores]]); project first so a
    // fired spread moves only the profiled columns
    val src = Spread.toCores(df.select(cols.map(col): _*))
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        count(when(col(c).isNull, 1)).as(s"__nul_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("double").as(s"__mn_$c"),
        max(col(c)).cast("double").as(s"__mx_$c"),
        sum(col(c).cast("decimal(28,4)")).cast("double").as(s"__sm_$c"))
    }
    val wide = src.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__nn_$c").as("n_values"), col(s"__nul_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"), col(s"__mn_$c").as("min_v"),
        col(s"__mx_$c").as("max_v"), col(s"__sm_$c").as("sum_v"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}

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
}

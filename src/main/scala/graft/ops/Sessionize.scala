package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Gaps-and-islands sessionization over an event log.
  *
  * The batch shape of the classic streaming session window: events for
  * the same key belong to one session while consecutive gaps stay within
  * `gap`; a gap larger than `gap` starts a new session. Expressed as two
  * stacked window functions (lag to flag session starts, running sum to
  * number them) so the whole operator costs exactly ONE shuffle on the
  * key — the second window reuses the first's partitioning and sort.
  *
  * Scale: partition count follows `spark.sql.shuffle.partitions`; state
  * per partition is one row (the running counters), so the operator
  * streams at any corpus size. Skewed keys (one user = one partition's
  * worth of events) are bounded by per-user event counts, not corpus
  * size. The streaming equivalent lives in
  * [[graft.streaming.Streams]] via session windows.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per-key session number) to `df`.
    *
    * @param keyCols   session key (e.g. user id)
    * @param orderCol  monotone event-time column (numeric, e.g. unix
    *                  micros); ties broken by `tieCol` for a total order
    * @param tieCol    unique tie-break column (e.g. event id)
    * @param gap       max intra-session gap, in `orderCol` units
    */
  def sessionize(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: Column,
      tieCol: Column,
      gap: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCol, tieCol)
    val isStart = when(
      lag(orderCol, 1).over(w).isNull || orderCol - lag(orderCol, 1).over(w) > gap,
      lit(1L)).otherwise(lit(0L))
    df.withColumn("session_seq", sum(isStart).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast(LongType))
  }
}

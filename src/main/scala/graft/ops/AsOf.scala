package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-marker) attachment — SURVEY §2.3 J15's interval
  * join semantics, expressed as a single window pass instead of a range
  * join: each row picks up the latest qualifying value at or before its
  * own position within its key group.
  *
  * At scale this is one hash shuffle on the key (same partitioning a
  * range join would need) and a streaming sort within partitions — no
  * O(n·m) interval probing, no broadcast of the marker set.
  */
object AsOf {

  /** Attach `last value where markerCond` (at or before each row) as
    * `as`; rows before any marker get null.
    *
    * @param orderCols total order within a key group — include a
    *                  tie-breaker for determinism
    */
  def attachLastMarker(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      markerCond: Column,
      value: Column,
      as: String): DataFrame = {
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, last(when(markerCond, value), ignoreNulls = true).over(w))
  }

  /** Forward as-of: attach `first value where markerCond` at or AFTER
    * each row as `as`; rows after the last marker get null. Same single
    * shuffle + sort — the frame direction flips, not the plan shape. */
  def attachNextMarker(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      markerCond: Column,
      value: Column,
      as: String): DataFrame = {
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    df.withColumn(as, first(when(markerCond, value), ignoreNulls = true).over(w))
  }
}

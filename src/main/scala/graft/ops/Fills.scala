package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `tidyr::fill()`-style window fills (SURVEY §2.5 W1) — last/first
  * non-null over a running frame; one window spec shared by all filled
  * columns so Catalyst plans a single Window node (one shuffle+sort). */
object Fills {

  def fillDown(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column], cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df)((d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  def fillUp(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column], cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cols.foldLeft(df)((d, c) => d.withColumn(c, first(col(c), ignoreNulls = true).over(w)))
  }

  /** down-then-up ("downup"): trailing nulls take the last value,
    * leading nulls take the first. */
  def fillDownUp(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column], cols: Seq[String]): DataFrame = {
    val wDown = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wUp = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        coalesce(
          last(col(c), ignoreNulls = true).over(wDown),
          first(col(c), ignoreNulls = true).over(wUp)))
    }
  }
}

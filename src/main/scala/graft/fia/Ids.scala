package graft.fia

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Composite plot/tree identifiers (`R/fia_ids.R:16-80`). */
object Ids {

  private val plotParts = Seq("STATECD", "UNITCD", "COUNTYCD", "PLOT")
  private val treeParts = plotParts ++ Seq("SUBP", "TREE")

  /** Add `plot_ID` (and `tree_ID` when SUBP/TREE present). */
  def addCompositeIds(df: DataFrame): DataFrame = {
    val cols = df.columns.toSet
    require(plotParts.forall(cols), "Not all required columns are present")
    val withPlot = df.withColumn("plot_ID", concat_ws("_", plotParts.map(col): _*))
    if (treeParts.forall(cols))
      withPlot.withColumn("tree_ID", concat_ws("_", treeParts.map(col): _*))
    else withPlot
  }

  /** Split `tree_ID` (preferred) or `plot_ID` back into components. */
  def splitCompositeIds(df: DataFrame): DataFrame = {
    val cols = df.columns.toSet
    require(cols("tree_ID") || cols("plot_ID"), "No composite ID columns found")
    val (src, parts) =
      if (cols("tree_ID")) ("tree_ID", treeParts) else ("plot_ID", plotParts)
    parts.zipWithIndex.foldLeft(df) { case (d, (name, i)) =>
      d.withColumn(name, split_part(col(src), lit("_"), lit(i + 1)))
    }
  }
}

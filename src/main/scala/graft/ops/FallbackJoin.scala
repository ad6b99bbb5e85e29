package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-level coefficient lookup with fallback.
  *
  * Re-expression of the reference's `applyAllLevels` + `combineLevels2`
  * (`R/predictCRM2.R:629-727`): the reference joins a fact table against
  * 2-3 coefficient tables at successively coarser keys, keeping the first
  * level that matches (anti-join + rbind, 11×). Here: one broadcast left
  * join per level plus a `coalesce` per value column — same semantics, no
  * anti-joins, no unions, and every join is a broadcast hash join (the
  * dimension tables are tiny), so the fact table is never shuffled.
  */
object FallbackJoin {

  /** @param fact    large input
    * @param levels  (dim, joinKeys) in priority order; each dim must carry
    *                every column in `valueCols`
    * @param valueCols columns resolved by first-match-wins coalesce
    * @param levelCol optional output column recording which level matched
    *                 (1-based; null if none)
    */
  def apply(
      fact: DataFrame,
      levels: Seq[(DataFrame, Seq[String])],
      valueCols: Seq[String],
      levelCol: Option[String] = None): DataFrame = {
    var out = fact
    val tagged = levels.zipWithIndex.map { case ((dim, keys), i) =>
      val renamed = valueCols.foldLeft(dim) { (d, v) =>
        d.withColumnRenamed(v, s"${v}__l$i")
      }
      (renamed, keys, i)
    }
    tagged.foreach { case (dim, keys, i) =>
      val proj = dim.select((keys ++ valueCols.map(v => s"${v}__l$i")).map(col): _*)
      out = out.join(broadcast(proj), keys, "left")
    }
    valueCols.foreach { v =>
      out = out.withColumn(v, coalesce(levels.indices.map(i => col(s"${v}__l$i")): _*))
    }
    levelCol.foreach { lc =>
      // first matching level in priority order (1-based)
      val first = levels.indices.reverse.foldLeft(lit(null).cast("int")) { (acc, i) =>
        when(col(s"${valueCols.head}__l$i").isNotNull, lit(i + 1)).otherwise(acc)
      }
      out = out.withColumn(lc, first)
    }
    val drop = tagged.flatMap { case (_, _, i) => valueCols.map(v => s"${v}__l$i") }
    out.drop(drop: _*)
  }
}

package graft.fia

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Ecological province/division derivation from `ECOSUBCD` — pure column
  * expressions (no UDF), port of `R/getDivision.R:7-33`.
  *
  * Province: trim, then drop the last 1 char (length 4), 3 chars
  * (length 7), else 2 chars; empty stays empty. Division: province with
  * its last character replaced by "0". Nulls propagate as nulls.
  */
object Division {

  def province(c: Column): Column = {
    val t = trim(c)
    val n = length(t)
    when(n === 0, lit(""))
      .when(n === 4, t.substr(lit(1), lit(3)))
      .when(n === 7, t.substr(lit(1), n - 3))
      .otherwise(t.substr(lit(1), n - 2))
  }

  def division(c: Column): Column = {
    val y = province(c)
    val m = length(y)
    when(m === 0, lit("")).otherwise(concat(y.substr(lit(1), m - 1), lit("0")))
  }
}

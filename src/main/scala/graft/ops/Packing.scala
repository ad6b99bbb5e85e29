package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for LM training: documents in `idCol` order are
  * laid into fixed-`capacity` context windows as one contiguous token
  * stream — doc d starts at global token position `cum_before(d)`, so
  * it lands in bin `cum_before div capacity` at `cum_before mod
  * capacity` (the GPT-style pack-with-overflow layout: a document may
  * straddle its bin boundary and continue into the next window).
  *
  * Scale shape: the naive `sum(...) OVER (ORDER BY id)` is an
  * all-rows-to-one-task global window. This uses the same two-level
  * prefix sum as [[Sampling.systematicByWeight]]: per-bucket totals
  * (one partial-aggregated shuffle of one row per bucket), a global
  * running offset over the tiny bucket table, offsets broadcast back,
  * and each bucket computes its local exclusive running sum
  * independently — no task ever sees more than one bucket's rows.
  */
object Packing {

  /** @return input columns + (bin, offset); `offset` is the doc's
    *         start position inside its `capacity`-token window. */
  def packSequences(
      df: DataFrame, idCol: String, tokenCol: String,
      capacity: Long, bucketSpan: Long = 1000L): DataFrame = {
    require(capacity > 0, s"bad capacity $capacity")
    val withB = df.withColumn("__b", floor(col(idCol) / bucketSpan))
    val bucketTotals = withB.groupBy(col("__b"))
      .agg(sum(col(tokenCol).cast(LongType)).as("__bw"))
    val wOff = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("__off", coalesce(sum(col("__bw")).over(wOff), lit(0L)))
      .select(col("__b"), col("__off"))
    // exclusive running sum within the bucket + the bucket's offset
    val wIn = Window.partitionBy(col("__b")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withB.join(broadcast(offsets), "__b")
      .withColumn("__cum0",
        coalesce(sum(col(tokenCol).cast(LongType)).over(wIn), lit(0L)) + col("__off"))
      // integer div/mod — exact at any corpus size (no double floor)
      .withColumn("bin", expr(s"__cum0 div $capacity"))
      .withColumn("offset", pmod(col("__cum0"), lit(capacity)))
      .drop("__b", "__off", "__cum0")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic sampling/splitting operators for training-data
  * pipelines. Everything here is a pure function of the data (md5-based
  * hashing, integer arithmetic) — re-running over a re-shuffled,
  * re-partitioned, or incrementally-grown corpus assigns unchanged
  * rows to unchanged samples/splits, which is the property that matters
  * when the corpus is 100 TB and the split must be stable across
  * pipeline runs.
  */
object Sampling {

  /** Stable train/val/test assignment by key hash: bucket =
    * hash60(salt ':' key) mod 100, train < `trainPct`, val <
    * `trainPct + valPct`, test otherwise. Pure scan-side expression —
    * no shuffle, no state, stable under corpus growth. */
  def trainValTestSplit(
      key: Column, salt: String,
      trainPct: Int = 90, valPct: Int = 5): Column = {
    val b = pmod(Dedup.hash60(concat_ws(":", lit(salt), key)), lit(100L))
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Systematic (every-`step`-units) sampling by an integer weight
    * column: conceptually, lay all rows on a number line in `idCol`
    * order, each row occupying `weightCol` units, and keep every row
    * whose span crosses a multiple of `step`. Samples ~totalWeight/step
    * rows with inclusion probability proportional to weight —
    * deterministic, no RNG.
    *
    * Scale shape: the naive formulation is a GLOBAL running sum — an
    * all-rows-to-one-task window. This implementation is the standard
    * two-level prefix sum instead: rows bucket by `idCol / bucketSpan`,
    * each bucket's weight total aggregates (partial agg, one shuffle of
    * one row per bucket), the tiny bucket-totals table gets the global
    * running offset with a single-partition window over #buckets rows,
    * and the offsets broadcast back so each bucket computes its local
    * running sum independently — no task ever sees more than one
    * bucket's rows.
    *
    * @return input rows that cross a step boundary, with the crossing
    *         position as `cum` (1-based cumulative weight). */
  def systematicByWeight(
      df: DataFrame, idCol: String, weightCol: String,
      step: Long, bucketSpan: Long = 1000L): DataFrame = {
    val withB = df.withColumn("__b", floor(col(idCol) / bucketSpan))
    val bucketTotals = withB.groupBy(col("__b"))
      .agg(sum(col(weightCol).cast(LongType)).as("__bw"))
    // #buckets rows — the only global window runs over this tiny table
    val wOff = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("__off", coalesce(sum(col("__bw")).over(wOff), lit(0L)))
      .select(col("__b"), col("__off"))
    val wIn = Window.partitionBy(col("__b")).orderBy(col(idCol))
    withB.join(broadcast(offsets), "__b")
      .withColumn("cum",
        sum(col(weightCol).cast(LongType)).over(wIn) + col("__off"))
      // crosses a multiple of `step` iff cum mod step < weight — pure
      // integer arithmetic (a floor(cum/step) formulation would divide
      // in doubles)
      .filter(pmod(col("cum"), lit(step)) < col(weightCol))
      .drop("__b", "__off")
  }

  /** Deterministic corpus shuffle with GLOBAL positions: every row gets
    * `shuffle_key` = hash60(salt ':' id) and `pos` = its 1-based rank in
    * (shuffle_key, id) order — the reproducible training-order
    * permutation (same salt → same order, new salt → fresh order).
    *
    * Scale shape: a bare `row_number() OVER (ORDER BY hash)` sorts the
    * corpus on ONE task. Here the top `bucketBits` bits of the hash
    * range-bucket the rows (hash order == (bucket, in-bucket) order by
    * construction), bucket counts aggregate to a tiny offsets table,
    * and each bucket ranks independently and adds its offset — the
    * same two-level prefix-sum trick as [[systematicByWeight]]. */
  def deterministicShuffle(
      df: DataFrame, idCol: String, salt: String,
      bucketBits: Int = 6): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 20, s"bad bucketBits $bucketBits")
    val h = Dedup.hash60(concat_ws(":", lit(salt), col(idCol)))
    val withH = df.withColumn("__h", h)
      .withColumn("__b", shiftright(col("__h"), 60 - bucketBits))
    val counts = withH.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
    val wOff = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("__b"), col("__off"))
    val wIn = Window.partitionBy(col("__b")).orderBy(col("__h"), col(idCol))
    withH.join(broadcast(offsets), "__b")
      .withColumn("pos", row_number().over(wIn).cast(LongType) + col("__off"))
      .withColumnRenamed("__h", "shuffle_key")
      .drop("__b", "__off")
  }
}

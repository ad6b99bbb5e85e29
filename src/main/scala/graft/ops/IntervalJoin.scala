package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval-point join: match point rows into the intervals
  * that contain them, WITHOUT the nested-loop plan Spark's native
  * range join degenerates to when the equi-key is low-cardinality
  * (e.g. event_type: 5 keys → every key's intervals × points is a
  * quasi-cross-join).
  *
  * The standard production fix: quantize time into fixed buckets.
  * Each interval explodes to the buckets it covers (≤ len/bucket + 1
  * rows); each point lands in exactly ONE bucket; the join becomes an
  * equi-join on (keys..., bucket) with the exact containment predicate
  * as a residual filter. Candidate volume is bounded by per-bucket
  * occupancy — co-resident rows in time — not by the key's total
  * cardinality, and a point matches each interval at most once (its
  * single bucket), so no distinct pass is needed.
  *
  * Scale shape: one shuffle per side on (keys, bucket); a hot bucket
  * (burst of events in one window) is an AQE-skew-splittable equi-join
  * key, which a nested-loop plan can never be. Pick `bucketUs` near
  * the TYPICAL interval length: larger buckets → fewer interval
  * replicas but more residual-filtered candidates; smaller → the
  * reverse.
  */
object IntervalJoin {

  /** @param intervals rows carrying `keys`, `[startCol, endCol)` in
    *                  long micros (end exclusive)
    * @param points    rows carrying `keys` and `tsCol` in long micros
    * @return intervals joined to their contained points (inner) */
  def bucketedIntervalJoin(
      intervals: DataFrame, points: DataFrame, keys: Seq[String],
      startCol: String, endCol: String, tsCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket",
        explode(sequence(
          expr(s"$startCol div $bucketUs"),
          expr(s"($endCol - 1) div $bucketUs"))))
    val pt = points.withColumn("__bucket", expr(s"$tsCol div $bucketUs"))
    iv.join(pt, keys :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }

  /** Interval-interval OVERLAP join under the same bucketing scheme.
    * Both sides explode to their covered buckets; a candidate pair
    * shares every bucket its overlap spans, so a naive bucket join
    * emits duplicates. The standard dedup-free trick: keep a pair only
    * in the FIRST bucket both sides inhabit —
    * `bucket == max(floor(lStart/b), floor(rStart/b))` — which every
    * overlapping pair satisfies exactly once, so no distinct pass (and
    * its extra shuffle) is needed. Overlap is half-open:
    * `lStart < rEnd && rStart < lEnd`.
    *
    * `keys` may be empty — then time co-residency alone bounds
    * candidates, which is precisely the case (no shared equi-key) that
    * sends Spark's native plan to a nested loop. */
  def bucketedOverlapJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val l = left
      .filter(col(lEnd) > col(lStart))
      .withColumn("__bucket",
        explode(sequence(
          expr(s"$lStart div $bucketUs"), expr(s"($lEnd - 1) div $bucketUs"))))
    val r = right
      .filter(col(rEnd) > col(rStart))
      .withColumn("__bucket",
        explode(sequence(
          expr(s"$rStart div $bucketUs"), expr(s"($rEnd - 1) div $bucketUs"))))
    l.join(r, keys :+ "__bucket")
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("__bucket") ===
        greatest(expr(s"$lStart div $bucketUs"), expr(s"$rStart div $bucketUs")))
      .drop("__bucket")
  }
}

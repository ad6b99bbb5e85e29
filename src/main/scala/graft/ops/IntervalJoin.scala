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
}

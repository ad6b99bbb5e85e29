package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Bounded-buffer exact top-k aggregate (heavy hitters, the scale path).
  *
  * The window-function formulation of per-group top-k
  * (`row_number() OVER (PARTITION BY g ORDER BY cnt DESC) <= k`) sorts
  * every group in full: the shuffle carries ALL (group, item) rows and
  * the sort is O(n log n) per group. This `Aggregator` instead keeps a
  * k-element buffer per group, combines partially on the map side, and
  * ships only O(k) state per group through the shuffle — at 100 TB the
  * difference between shuffling the vocabulary and shuffling k rows per
  * language. Results are identical to the window form (exact counts,
  * deterministic (count desc, key asc) order), unlike sketch-based
  * heavy hitters.
  */
object TopK {

  /** (count, key); ranked by count desc, then key asc. */
  type Item = (Long, String)

  final class TopKAgg(k: Int) extends Aggregator[Item, Seq[Item], Seq[Item]] {
    private def better(a: Item, b: Item): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    // buffer kept sorted best-first, size <= k; k is small so insertion
    // into an immutable vector beats heap bookkeeping
    private def insert(buf: Seq[Item], x: Item): Seq[Item] =
      if (buf.size >= k && better(buf.last, x)) buf
      else {
        val (pre, post) = buf.span(better(_, x))
        val merged = (pre :+ x) ++ post
        if (merged.size > k) merged.take(k) else merged
      }

    def zero: Seq[Item] = Vector.empty
    def reduce(b: Seq[Item], a: Item): Seq[Item] = insert(b, a)
    def merge(b1: Seq[Item], b2: Seq[Item]): Seq[Item] = b2.foldLeft(b1)(insert)
    def finish(r: Seq[Item]): Seq[Item] = r
    def bufferEncoder: Encoder[Seq[Item]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Item]] = ExpressionEncoder()
  }

  /** Column aggregate: `topK(5)(col("cnt"), col("key"))` returns an
    * array<struct<_1: count, _2: key>> of the group's top k. */
  def topK(k: Int): UserDefinedFunction =
    udaf(new TopKAgg(k), ExpressionEncoder[Item]())
}

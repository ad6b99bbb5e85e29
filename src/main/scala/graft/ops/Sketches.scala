package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed sketches, built so their OUTPUT is engine-exact — the
  * whole sketch (hashing, register updates, estimate arithmetic) is
  * reproducible bit-for-bit in any engine with md5 and 64-bit ints,
  * unlike black-box `approx_count_distinct` whose HLL++ registers are
  * implementation-private.
  *
  * HyperLogLog (Flajolet et al. 2007), p=6 / m=64 registers:
  *   - value hash: md5-based 60-bit [[Dedup.hash60]];
  *   - bucket  = h mod 64, suffix = h >> 6 (54 bits);
  *   - rho     = leading-zero count of the suffix + 1 (via the binary
  *     string — portable, no clz builtin needed);
  *   - registers aggregate with max (commutative — one shuffle of at
  *     most m rows per partition after partial aggregation);
  *   - the harmonic sum uses FIXED-POINT arithmetic: sum of
  *     2^(54 - M_j) as BIGINT (exact, order-independent — a double sum
  *     of 2^-M_j would need 60 significand bits and become
  *     aggregation-order-dependent), converted to double exactly once.
  *
  * No small/large-range correction: those need ln(), whose last-ulp
  * behavior differs across libm implementations; the raw estimate is
  * the documented output (fine for the n >> m regime this targets).
  */
object Sketches {

  val P = 6
  val M = 1 << P // 64 registers
  private val ALPHA_64 = 0.709 // HLL alpha for m = 64

  /** Per-register (bucket, M_j) for a value column. */
  def hllRegisters(values: DataFrame, valueCol: String): DataFrame = {
    val h = Dedup.hash60(col(valueCol))
    values
      .select(
        pmod(h, lit(M.toLong)).as("bucket"),
        shiftright(h, P).as("suffix"))
      .select(col("bucket"),
        // rho = index of first 1-bit in the 54-bit suffix, 55 if none
        when(col("suffix") === 0L, lit(55))
          .otherwise(instr(lpad(bin(col("suffix")), 54, "0"), "1"))
          .as("rho"))
      .groupBy(col("bucket"))
      .agg(max(col("rho")).as("m_j"))
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005) over token
    * occurrences, engine-exact like the HLL above: row i of the d×w
    * counter matrix buckets each token by the md5-based
    * `hash60(i || ':' || tok) mod w`, counters aggregate with plain
    * integer sums (one shuffle of at most d·w rows after partial
    * aggregation, whatever the corpus size), and a point estimate is
    * the MIN over the d bucket counters — always an over-estimate,
    * within eps·N with probability 1-delta for w=⌈e/eps⌉, d=⌈ln 1/delta⌉.
    *
    * Cost shape: the d md5 hashes are paid per DISTINCT token, not per
    * occurrence — occurrences reduce to (token, n) first (a cheap
    * string-hash shuffle with map-side partial aggregation), then each
    * vocabulary entry contributes its count to d buckets. At 100 TB the
    * vocabulary is orders of magnitude smaller than the occurrence
    * stream, so this moves the expensive hashing off the hot path.
    *
    * @param occurrences one row per token OCCURRENCE (not distinct)
    * @return the (i, b, c) counter matrix, d·w rows max */
  def cmsCounters(
      occurrences: DataFrame, tokCol: String,
      depth: Int, width: Int): DataFrame =
    cmsCountersWeighted(
      occurrences.groupBy(col(tokCol)).agg(count(lit(1)).as("__n")),
      tokCol, "__n", depth, width)

  /** CMS counters from pre-aggregated (token, count) rows: each token
    * adds `countCol` to counter (i, hash60(i ':' tok) mod w) for every
    * row i — identical matrix to [[cmsCounters]] on the raw stream. */
  def cmsCountersWeighted(
      counts: DataFrame, tokCol: String, countCol: String,
      depth: Int, width: Int): DataFrame =
    counts
      .select(col(countCol).as("__w"), explode(array((0 until depth).map { i =>
        struct(lit(i).as("i"),
          pmod(Dedup.hash60(concat_ws(":", lit(i), col(tokCol))),
            lit(width.toLong)).as("b"))
      }: _*)).as("s"))
      .groupBy(col("s.i").as("i"), col("s.b").as("b"))
      .agg(sum(col("__w")).as("c"))

  /** CMS point estimates for the given candidate tokens: hash each
    * candidate with the same row hashes and take the min matching
    * counter. The counter matrix broadcasts (d·w rows), so estimating
    * costs no extra shuffle over the candidate set. */
  def cmsEstimate(
      counters: DataFrame, candidates: DataFrame, tokCol: String,
      depth: Int, width: Int): DataFrame =
    candidates
      .select(col(tokCol), explode(array((0 until depth).map { i =>
        struct(lit(i).as("i"),
          pmod(Dedup.hash60(concat_ws(":", lit(i), col(tokCol))),
            lit(width.toLong)).as("b"))
      }: _*)).as("s"))
      .select(col(tokCol), col("s.i").as("i"), col("s.b").as("b"))
      .join(broadcast(counters), Seq("i", "b"))
      .groupBy(col(tokCol))
      .agg(min(col("c")).as("cms_est"))

  /** Per-group HLL registers (group, bucket, m_j) — the per-shard
    * sketches a distributed pipeline keeps (one per source / file /
    * day); compose with [[hllMergeRegisters]]. */
  def hllRegistersBy(values: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val h = Dedup.hash60(col(valueCol))
    values
      .select(col(groupCol).as("grp"),
        pmod(h, lit(M.toLong)).as("bucket"),
        shiftright(h, P).as("suffix"))
      .select(col("grp"), col("bucket"),
        when(col("suffix") === 0L, lit(55))
          .otherwise(instr(lpad(bin(col("suffix")), 54, "0"), "1"))
          .as("rho"))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("m_j"))
  }

  /** Sketch union: element-wise register max — HLL's defining merge
    * property (registers(A ∪ B) = max(registers(A), registers(B))
    * bucket-wise), which is what lets per-shard sketches compose into
    * a corpus estimate without re-scanning anything. The input is a
    * (…, bucket, m_j) table from any number of [[hllRegistersBy]]
    * groups; at most groups × 64 rows ever shuffle. */
  def hllMergeRegisters(regs: DataFrame): DataFrame =
    regs.groupBy(col("bucket")).agg(max(col("m_j")).as("m_j"))

  /** Single-row sketch summary from a (bucket, m_j) register table:
    * the HLL estimate plus the exact fixed-point register sum
    * (s_fixed = sum 2^(55-M_j) — scale 2^55 because rho reaches 55 on
    * an all-zero suffix; absent registers contribute 2^55) and the
    * present-register count. */
  def hllSummary(regs: DataFrame): DataFrame = {
    val two55 = 36028797018963968L // 1 << 55
    regs.agg(
      (sum(expr("shiftleft(CAST(1 AS BIGINT), 55 - m_j)")) +
        (lit(M.toLong) - count(lit(1))) * lit(two55)).as("s_fixed"),
      count(lit(1)).as("n_regs"))
      .select(
        col("s_fixed"), col("n_regs"),
        // alpha * m^2 * 2^55 / S — identical op order in the oracle
        (lit(ALPHA_64) * lit(4096.0) * lit(two55.toDouble) /
          col("s_fixed").cast("double")).as("hll_est"))
  }

  /** Whole-stream sketch: [[hllSummary]] over [[hllRegisters]]. */
  def hllDistinct(values: DataFrame, valueCol: String): DataFrame =
    hllSummary(hllRegisters(values, valueCol))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for joins whose key distribution is known to be
  * skewed (a handful of hot keys hold most rows).
  *
  * A plain shuffle join sends every row of a hot key to ONE reducer;
  * at 100 TB that single task dominates the stage. Salting splits each
  * hot key across `salt` reducers: the probe (large, skewed) side gets a
  * deterministic salt in [0, salt), the build side is replicated `salt`
  * times, and the join key becomes (key, salt). Row multiplicity is
  * unchanged — each probe row matches exactly the one build replica
  * carrying its salt value.
  *
  * Spark's AQE skew-join handles this transparently for sort-merge
  * joins at runtime; this operator is for the cases AQE does not cover
  * (deterministic pre-planning, broadcast-ineligible build sides of a
  * few million rows, or engines/pipelines where AQE is disabled).
  *
  * The salt is `pxxhash64` of the probe row's key columns plus a
  * uniform spreader over the whole row when `spreadCols` are given —
  * deterministic (re-runs produce identical partitioning), unlike
  * `rand()`-based salting.
  */
object SkewJoin {

  /** Inner or left-outer salted equi-join on `keys`.
    *
    * @param probe      large, skewed side (row set preserved under "left")
    * @param build      smaller side, replicated `salt` times
    * @param keys       equi-join key column names (present on both sides)
    * @param salt       number of splits per key (per-key parallelism)
    * @param spreadCols probe columns used to spread rows of the same key
    *                   across salts; default: all non-key probe columns
    * @param joinType   "inner" or "left"
    */
  def saltedJoin(
      probe: DataFrame, build: DataFrame, keys: Seq[String], salt: Int,
      spreadCols: Seq[String] = Nil, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(joinType == "inner" || joinType == "left",
      s"salted join supports inner/left, got $joinType")
    val spread: Seq[Column] =
      (if (spreadCols.nonEmpty) spreadCols
       else probe.columns.toSeq.filterNot(keys.contains)).map(col)
    val p = probe.withColumn("__salt",
      pmod(xxhash64(spread: _*), lit(salt)).cast("int"))
    val b = build.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    // A salted join exists because the build side is too big to
    // broadcast — but Catalyst only sees the PRE-explode size estimate
    // and happily broadcasts the salt× replicated table (a driver-built
    // hashed relation of salt× rows: the single-node bottleneck this
    // operator is supposed to remove). Pin a shuffled hash join: each
    // reducer builds only its (key, salt) slice, and no sort is paid.
    p.join(b.hint("shuffle_hash"), keys :+ "__salt", joinType).drop("__salt")
  }
}

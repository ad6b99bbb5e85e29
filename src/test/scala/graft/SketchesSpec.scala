package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sketches

class SketchesSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  test("HLL estimate lands within the m=64 error envelope; dup-insensitive") {
    import spark.implicits._
    val n = 20000
    val vals = spark.range(n).select($"id".cast("string").as("v"))
    val r = Sketches.hllDistinct(vals, "v").collect()(0)
    val est = r.getAs[Double]("hll_est")
    // standard error ~1.04/sqrt(64) = 13%; allow 3 sigma
    assert(math.abs(est - n) / n < 0.4, s"estimate $est too far from $n")
    assert(r.getAs[Long]("n_regs") == 64)

    // duplicating every value must not move a single register
    val dup = vals.union(vals).union(vals)
    val r2 = Sketches.hllDistinct(dup, "v").collect()(0)
    assert(r2.getAs[Long]("s_fixed") == r.getAs[Long]("s_fixed"))
    assert(r2.getAs[Double]("hll_est") == est)
  }

  test("registers are deterministic and bounded") {
    import spark.implicits._
    val vals = spark.range(500).select($"id".cast("string").as("v"))
    val regs = Sketches.hllRegisters(vals, "v").collect()
    assert(regs.length <= 64)
    assert(regs.forall { r =>
      val b = r.getAs[Long]("bucket"); val m = r.getAs[Int]("m_j")
      b >= 0 && b < 64 && m >= 1 && m <= 55
    })
  }

  test("merged per-shard sketches EQUAL the whole-stream sketch") {
    import spark.implicits._
    // arbitrary 3-way shard split; merge must be exact regardless
    val vals = spark.range(2000)
      .select(($"id" % 3).cast("string").as("grp"), $"id".cast("string").as("v"))
    val merged = Sketches.hllSummary(
      Sketches.hllMergeRegisters(Sketches.hllRegistersBy(vals, "grp", "v")))
      .collect()(0)
    val direct = Sketches.hllDistinct(vals, "v").collect()(0)
    assert(merged.getLong(0) == direct.getLong(0))     // s_fixed
    assert(merged.getLong(1) == direct.getLong(1))     // n_regs
    assert(merged.getDouble(2) == direct.getDouble(2)) // hll_est, bit-equal
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain mixing — the LM data-mixture primitive (Pile/LLaMA-style
  * recipes): interleave documents from weighted sources into one
  * deterministic training order where source `s` appears with
  * frequency proportional to `weight(s)`.
  *
  * The r-th document of source s (ranked by `idCol` within the source)
  * gets `mix_key = (r - 0.5) / weight(s)` — the low-discrepancy
  * weighted round-robin: sorting by `mix_key` yields the mixed stream.
  * No global rank is materialized; ordering by the key is the
  * consumer's (or the writer's range-partitioned sort's) job.
  *
  * Scale shape: the per-source rank does NOT use a bare
  * `row_number() OVER (PARTITION BY source)` — one dominant source
  * would put its whole corpus on a single task. Ranks come from the
  * same two-level prefix scheme as [[Sampling]]/[[Packing]]: per-
  * (source, id-bucket) counts aggregate partially, per-source running
  * offsets compute over the tiny bucket table, broadcast back, and
  * each bucket ranks its own rows independently.
  *
  * Keys round to 6 dp so results reproduce across engines.
  */
object Mixing {

  /** @param weights  source → sampling weight; sources absent from the
    *                 map fall back to `defaultWeight`
    * @return (id, source, src_rank, mix_key) */
  def mixKeys(
      df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      bucketSpan: Long = 1000L): DataFrame = {
    require(weights.values.forall(_ > 0) && defaultWeight > 0, "weights must be > 0")
    val withB = df.select(col(idCol).as("id"), col(sourceCol).as("source"))
      .withColumn("__b", floor(col("id") / bucketSpan))
    val counts = withB.groupBy(col("source"), col("__b"))
      .agg(count(lit(1)).as("__n"))
    val wOff = Window.partitionBy(col("source")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("source"), col("__b"), col("__off"))
    val wIn = Window.partitionBy(col("source"), col("__b")).orderBy(col("id"))
    val w = coalesce(element_at(typedLit(weights), col("source")), lit(defaultWeight))
    withB.join(broadcast(offsets), Seq("source", "__b"))
      .withColumn("src_rank", row_number().over(wIn).cast("long") + col("__off"))
      .withColumn("mix_key", round((col("src_rank") - lit(0.5)) / w, 6))
      .select(col("id"), col("source"), col("src_rank"), col("mix_key"))
  }

  /** Temperature-based mixture weights (the GPT-3 / PaLM / mT5 rule):
    * domain i samples with probability ∝ nᵢ^τ — τ = 1 is proportional,
    * τ → 0 uniform; τ ∈ (0, 1) upweights small domains so low-resource
    * sources are not drowned by the head. This implementation fixes
    * τ = 1/2, i.e. weight ∝ √nᵢ: `sqrt` is an IEEE-754
    * correctly-rounded operation in every conforming engine (unlike
    * `pow(x, τ)` for general τ, whose last ulp is libm-private), so
    * the mixture table is cross-engine EXACT and the gate can hash it.
    *
    * One aggregation over the corpus (token counts per domain; partial
    * aggregation) + arithmetic over the tiny domain table. Weights are
    * micro-quantized (×1e6, floor) for the same exactness reason the
    * engine quantizes cosine scores.
    *
    * @return (domain, n_tokens, weight_q, boost_q) where weight_q is
    *         the mixture probability in micro-units and boost_q the
    *         over/under-sampling factor vs proportional, also in
    *         micro-units */
  def temperatureWeightsSqrt(
      docs: DataFrame, domainCol: String, tokenCountCol: org.apache.spark.sql.Column)
      : DataFrame = {
    val counts = docs
      .groupBy(col(domainCol).as("domain"))
      .agg(sum(tokenCountCol.cast("long")).as("n_tokens"))
    // quantize √n to integer micro-units FIRST: the normalizing sum is
    // then a LONG sum (order-independent, exact) instead of a double
    // sum whose accumulation order would differ across engines. √ and
    // one multiply are single IEEE ops — bit-identical everywhere.
    val wAll = Window.partitionBy()
    counts
      .withColumn("__sq", floor(sqrt(col("n_tokens").cast("double")) * 1e6).cast("long"))
      .withColumn("__z", sum(col("__sq")).over(wAll))
      .withColumn("__nz", sum(col("n_tokens")).over(wAll))
      // integer floor-divisions from here on: exact in any engine
      .withColumn("weight_q", expr("(__sq * 1000000L) div __z"))
      .withColumn("boost_q", expr("(weight_q * __nz) div n_tokens"))
      .select(col("domain"), col("n_tokens"), col("weight_q"), col("boost_q"))
  }
}

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
}

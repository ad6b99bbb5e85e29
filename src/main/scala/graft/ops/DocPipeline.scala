package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data
  * pipeline actually runs, as one operator:
  *
  *   1. quality gate: minimum token count;
  *   2. language gate: heuristic language ID equals the target;
  *   3. exact dedup: first document per normalized-content fingerprint;
  *   4. near-dup removal: MinHash-LSH candidate pairs verified by exact
  *      Jaccard; of each pair (i < j) the higher id `j` is dropped
  *      (deterministic keep-first policy — the standard large-scale
  *      heuristic; full transitive closure would need an iterative
  *      connected-components pass).
  *
  * Every stage is a proven-exact component ([[TextAnalysis]], [[Dedup]])
  * so the whole composition stays oracle-checkable cross-engine. Scale
  * shape: the gates are scan-local (no shuffle); exact dedup is one
  * hash shuffle on the fingerprint; LSH is the bounded-bucket candidate
  * join — no stage materializes O(n^2) state.
  */
object DocPipeline {

  def curate(
      docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int, lang: String,
      numPerms: Int = 6, bandSize: Int = 3, threshold: Double = 0.9,
      maxBucket: Option[Int] = Some(100)): DataFrame = {
    val gated = docs
      .filter(TextAnalysis.tokenCount(col(textCol)) >= minTokens)
      .filter(TextAnalysis.langId(col(textCol)) === lang)
    val deduped = Dedup.exactDedupRows(gated, idCol, textCol)
    val pairs = Dedup.minHashLshPairs(
      deduped, idCol, textCol, numPerms, bandSize, threshold, maxBucket)
    val dropped = pairs.select(col("j").as(idCol)).distinct()
    deduped.join(dropped, Seq(idCol), "left_anti")
  }
}

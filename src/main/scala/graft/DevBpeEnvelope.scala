package graft

import org.apache.spark.sql.functions._

/** Dev probe (round-9): the BPE training ENVELOPE — a 1k-merge
  * training over a synthetic vocabulary, timed, to record what the
  * driver-side merge loop (Bpe.trainLocalWithVocab) sustains vs the
  * 3-Spark-jobs-per-merge distributed loop. The corpus is built from
  * deterministic base-26 words so the vocab size is controlled and no
  * real data is involved.
  * Usage: SPARK_GRAFT_BPE_WORDS=50000 SPARK_GRAFT_BPE_MERGES=1000
  *        runMain graft.DevBpeEnvelope
  */
object DevBpeEnvelope {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      math.min(32, Runtime.getRuntime.availableProcessors()))
    spark.sparkContext.setLogLevel("WARN")
    val nWords = sys.env.getOrElse("SPARK_GRAFT_BPE_WORDS", "50000").toInt
    val nMerges = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "1000").toInt

    // deterministic vocabulary: 8-char base-26 words with Zipf-ish
    // counts (id % 97 + 1) — each row is one "document" of one word
    val docs = spark.range(nWords).select(
      concat((0 until 8).map(j =>
        expr(s"char(97 + CAST(id / ${math.pow(26, j).toLong} AS BIGINT) % 26)")): _*)
        .as("text"),
      (col("id") % 97 + 1).as("w"))
      // replicate by weight via explode to give counts without a UDF
      .select(explode(expr("transform(sequence(1, CAST(w AS INT)), x -> text)")).as("text"))

    val t0 = System.nanoTime()
    val (merges, vocab) = graft.ops.Bpe.trainLocalWithVocab(
      spark, docs, "text", nMerges)
    val nLearned = merges.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val vocabSize = vocab.count()
    println(f"[bpeenv] words=$vocabSize merges=$nLearned sec=$sec%.1f " +
      f"merges_per_sec=${nLearned / sec}%.1f")
    spark.stop()
  }
}

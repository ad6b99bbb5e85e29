package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING as a Spark workload — the
  * missing piece between corpus curation and model training: the same
  * engine that dedups and scores the corpus learns the vocabulary.
  *
  * Algorithm (Sennrich, Haddow & Birch 2016, "Neural Machine
  * Translation of Rare Words with Subword Units", alg. 1): start from
  * characters, repeatedly merge the most frequent adjacent symbol
  * pair. The classic trainer optimization IS the distributed-scale
  * shape: the corpus collapses to `(word, count)` ONCE (the only
  * corpus-sized shuffle — partial-aggregated word counting), and every
  * merge iteration runs over the VOCAB, which is orders of magnitude
  * smaller than the corpus (and is what a driver-side trainer holds in
  * a dict; here it stays a cached DataFrame, so a web-scale vocab of
  * hundreds of millions of distinct words still distributes).
  *
  * Per iteration: one vocab-sized aggregation (pair counts,
  * partial-aggregated — the shuffle moves ≤ distinct-pair rows), one
  * `LIMIT 1` collect (the argmax pair, a single row), and one
  * codegen'd `replace` projection updating the symbol strings. Ties
  * break by (count DESC, pair ASC) — total order, engine-independent.
  *
  * Word state is the WRAPPED symbol string `|s1||s2||…|` — every
  * symbol carries its own delimiters (symbols never contain `|`), so
  * the literal pattern `|x||y|` for a pair occupies characters no
  * other pair-match can share. That makes left-to-right
  * non-overlapping `replace(s, '|x||y|', '|xy|')` EXACTLY greedy BPE
  * merge application, including runs (`aaaa` + merge (a,a) → `aa aa`,
  * where a single-bar encoding would stall after one merge because
  * adjacent matches would need to share a delimiter). `replace` is the
  * same op every engine implements identically, which is what makes
  * the DuckDB oracle (`q_bpe_merges` / `q_bpe_vocab`) bit-exact.
  */
object Bpe {

  /** Lower-cased alphabetic word counts — the one corpus-sized pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), " ")).as("word"))
      .filter(length(col("word")) > 0 && col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** `|c1||c2||…|` initial symbol string for a word. */
  private def charRepr(word: Column): Column =
    regexp_replace(word, "(.)", "|$1|")

  /** Symbols of a repr string (the `||` junctions split to an empty
    * string that the filter drops). */
  private def symsCol(s: Column): Column =
    filter(split(s, "\\|"), x => x =!= "")

  /** Adjacent symbol pairs of a repr string, as `"left right"`.
    * slice+zip_with, not sequence(0, n-2): Spark's sequence DESCENDS
    * for n < 2 and would index out of bounds on 1-symbol words. */
  private def pairCol(s: Column): Column = {
    val syms = symsCol(s)
    val m = greatest(size(syms) - 1, lit(0))
    zip_with(slice(syms, lit(1), m), slice(syms, lit(2), m),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Learned merge table + final vocab symbol strings.
    *
    * @return (merges (rank, lft, rgt, cnt) in learning order,
    *          vocab (word, n, s) after all merges) */
  def trainWithVocab(
      spark: SparkSession, docs: DataFrame, textCol: String,
      numMerges: Int, rerootEvery: Int = 16): (DataFrame, DataFrame) = {
    val wc = wordCounts(docs, textCol).persist()
    var vocab = wc.withColumn("s", charRepr(col("word")))
    var lastCache: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= numMerges && !exhausted) {
      val best = vocab
        .select(col("n"), explode(pairCol(col("s"))).as("pr"))
        .groupBy("pr").agg(sum("n").as("cnt"))
        .orderBy(desc("cnt"), asc("pr"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val Array(lft, rgt) = best(0).getString(0).split(' ')
        merges += ((r, lft, rgt, best(0).getLong(1)))
        vocab = vocab.withColumn("s",
          replace(col("s"), lit(s"|$lft||$rgt|"), lit(s"|$lft$rgt|")))
        // keep the logical plan shallow over long trainings: the replace
        // chain grows one node per merge and every iteration's analyzer
        // pass walks it — same discipline as fia.Pipeline's re-root
        if (r % rerootEvery == 0) {
          val c = vocab.persist()
          c.count()
          vocab = spark.createDataFrame(c.rdd, c.schema)
          lastCache.foreach(_.unpersist(false))
          lastCache = Some(c)
        }
        r += 1
      }
    }
    import spark.implicits._
    val mergesDf = merges.toSeq.toDF("rank", "lft", "rgt", "cnt")
    (mergesDf, vocab)
  }

  /** Just the merge table. */
  def train(spark: SparkSession, docs: DataFrame, textCol: String,
      numMerges: Int): DataFrame =
    trainWithVocab(spark, docs, textCol, numMerges)._1

  /** Final symbol inventory after training: each vocab word's symbols,
    * weighted by word count — the learned subword distribution. */
  def vocabSymbols(vocab: DataFrame): DataFrame =
    vocab
      .select(col("n"), explode(symsCol(col("s"))).as("sym"))
      .groupBy("sym").agg(sum("n").as("total"))

  /** Apply a learned merge list (rank order) to new words — encoding is
    * the same fold of literal replaces the trainer used, one codegen'd
    * projection per merge, no shuffle. */
  def encodeWords(words: DataFrame, wordCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val repr = merges.foldLeft(charRepr(col(wordCol))) { case (s, (l, rg)) =>
      replace(s, lit(s"|$l||$rg|"), lit(s"|$l$rg|"))
    }
    words.withColumn("tokens", symsCol(repr))
  }
}

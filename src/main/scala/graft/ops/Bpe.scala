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

  /** Driver-side merge loop over the collapsed (word, n) table — the
    * production ENVELOPE for realistic vocabularies:
    * [[trainWithVocab]] schedules 3 Spark jobs per merge, so a
    * 50k-merge vocab is ~150k driver-coordinated jobs — hours of pure
    * scheduling latency while each job does milliseconds of vocab-sized
    * work. The corpus-sized pass ([[wordCounts]]) stays distributed;
    * when the DISTINCT-WORD table fits a capped collect (the standard
    * case — even web corpora hold ~10^7 distinct alphabetic words), the
    * merge loop runs in driver memory with an inverted pair→words index
    * and INCREMENTAL pair-count maintenance: each merge touches only
    * the words containing the merged pair — the classic fast-trainer
    * shape. Merge selection, tie-break (count DESC, `"lft rgt"` ASC —
    * words are ASCII by [[wordCounts]]' filter, so JVM and engine
    * string orders agree), and greedy left-to-right application are
    * EXACTLY [[trainWithVocab]]'s; BpeSpec asserts merge-list and
    * final-vocab equality, and the same DuckDB training replay oracles
    * both (`q_bpe_merges` / `q_bpe_local`). Throughput at the recorded
    * envelope: see PLANS.md round-9 (1k merges).
    *
    * @param maxWords refuse loudly rather than silently OOM the driver
    *   when the vocab exceeds the cap; fall back to [[trainWithVocab]],
    *   which has no bound. */
  def trainLocalWithVocab(
      spark: SparkSession, docs: DataFrame, textCol: String,
      numMerges: Int, maxWords: Int = 20000000): (DataFrame, DataFrame) = {
    import spark.implicits._
    import scala.collection.mutable
    val probe = wordCounts(docs, textCol).limit(maxWords + 1).collect()
    require(probe.length <= maxWords,
      s"trainLocalWithVocab: more than $maxWords distinct words — " +
        "raise maxWords or use trainWithVocab (distributed merge loop)")
    val entries = probe.map(r => (r.getString(0), r.getLong(1)))
    val syms: Array[mutable.ArrayBuffer[String]] =
      entries.map(e => mutable.ArrayBuffer(e._1.map(_.toString): _*))
    val counts = entries.map(_._2)

    def pairsOf(s: mutable.ArrayBuffer[String]): IndexedSeq[String] =
      (0 until s.length - 1).map(i => s(i) + " " + s(i + 1))

    val pairCnt = mutable.HashMap.empty[String, Long]
    val pairWords = mutable.HashMap.empty[String, mutable.Set[Int]]
    for (i <- syms.indices; p <- pairsOf(syms(i))) {
      pairCnt.update(p, pairCnt.getOrElse(p, 0L) + counts(i))
      pairWords.getOrElseUpdate(p, mutable.Set.empty) += i
    }

    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    while (r <= numMerges && pairCnt.nonEmpty) {
      var bestP: String = null; var bestC = Long.MinValue
      for ((p, c) <- pairCnt)
        if (c > bestC || (c == bestC && p < bestP)) { bestP = p; bestC = c }
      val Array(lft, rgt) = bestP.split(' ')
      merges += ((r, lft, rgt, bestC))
      val affected = pairWords.getOrElse(bestP, mutable.Set.empty).toArray
      for (i <- affected) {
        val s = syms(i); val n = counts(i)
        val before = pairsOf(s)
        // greedy left-to-right non-overlapping — replace() semantics
        val out = mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < s.length) {
          if (j + 1 < s.length && s(j) == lft && s(j + 1) == rgt) {
            out += lft + rgt; j += 2
          } else { out += s(j); j += 1 }
        }
        syms(i) = out
        val after = pairsOf(out)
        // apply the pair-multiset diff to the global counts + index
        for (p <- before) {
          val c = pairCnt(p) - n
          if (c == 0L) pairCnt.remove(p) else pairCnt.update(p, c)
        }
        for (p <- after)
          pairCnt.update(p, pairCnt.getOrElse(p, 0L) + n)
        val bset = before.toSet; val aset = after.toSet
        for (p <- bset.diff(aset)) pairWords.get(p).foreach(_ -= i)
        for (p <- aset.diff(bset))
          pairWords.getOrElseUpdate(p, mutable.Set.empty) += i
      }
      r += 1
    }
    val mergesDf = merges.toSeq.toDF("rank", "lft", "rgt", "cnt")
    val vocabDf = entries.indices
      .map(i => (entries(i)._1, counts(i), syms(i).mkString("|", "||", "|")))
      .toDF("word", "n", "s")
    (mergesDf, vocabDf)
  }

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

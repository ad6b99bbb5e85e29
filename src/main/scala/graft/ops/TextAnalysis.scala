package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language-ID heuristics, and document
  * fingerprinting. All pure column expressions (whole-stage codegen; no
  * UDFs) so they run at scan speed over 100 TB of documents.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token count: alpha runs, digit runs, and single
    * non-alphanumeric marks each count as one token. */
  def tokenCountBpe(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Quality-score components + a composite in [0,1]: length band,
    * punctuation density, stopword ratio, mean token length. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val nTok = tokenCount(text)
    val nPunct = regexp_count(text, lit("[.,;:!?]"))
    val nStop = regexp_count(text, lit("\\b(the|a|an|and|or|of|to|in|is)\\b"))
    val stopRatio = nStop.cast(DoubleType) / nTok.cast(DoubleType)
    val punctRatio = nPunct.cast(DoubleType) / nChars.cast(DoubleType)
    val meanTokLen = nChars.cast(DoubleType) / nTok.cast(DoubleType)
    Seq(
      "n_chars_c" -> nChars,
      "n_tokens" -> nTok,
      "n_punct" -> nPunct,
      "stop_ratio" -> stopRatio,
      "punct_ratio" -> punctRatio,
      "mean_tok_len" -> meanTokLen)
  }

  /** Gopher-style rule-based filter: every rule is a named failure
    * predicate over whitespace tokens; a document passes iff no rule
    * fires. Returns the failed-rule names as a sorted array so
    * downstream can both filter (`size(...) = 0`) and histogram WHY
    * documents were dropped — the reject-reasons breakdown is a
    * standard curation diagnostic. Pure column expressions; thresholds
    * follow the published Gopher ranges scaled to this corpus. Mean
    * word length and type-token ratio are each a single exact-integer
    * sum followed by one double division, so the threshold comparisons
    * are engine-exact.
    */
  def ruleFailures(text: Column, minTokens: Int = 25, maxTokens: Int = 90,
      maxMeanWordLen: Double = 5.0, minTtr: Double = 0.35): Column = {
    val toks = split(text, " ")
    val n = size(toks)
    val meanWordLen =
      aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast(DoubleType) /
        n.cast(DoubleType)
    val ttr = size(array_distinct(toks)).cast(DoubleType) / n.cast(DoubleType)
    array_sort(array_compact(array(
      when(n < minTokens, lit("too_few_tokens")),
      when(n > maxTokens, lit("too_many_tokens")),
      when(meanWordLen > maxMeanWordLen, lit("mean_word_len")),
      when(!(array_contains(toks, "the") || array_contains(toks, "a")),
        lit("no_stopword")),
      when(ttr < minTtr, lit("low_ttr")))))
  }

  /** Stopword-scoring language ID over a fixed language set; ties and
    * zero evidence resolve to "und". Counts are integers, so the argmax
    * is engine-exact. */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|is|in)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht)\\b",
    "fr" -> "\\b(le|la|les|et|est|une)\\b",
    "es" -> "\\b(el|los|las|es|una|y)\\b")

  def langScores(text: Column): Seq[(String, Column)] =
    langMarkers.map { case (l, p) => (l, regexp_count(text, lit(p))) }

  /** Argmax language with deterministic tie-breaking (first in
    * `langMarkers` order wins; all-zero -> "und"). */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
  }

  /** Normalized-content fingerprint: lowercase, strip non-alphanumerics,
    * collapse whitespace, md5. Equal fingerprints = same normalized text.
    * Normalization is the codegen'd one-pass
    * [[graft.functions.NormalizeAscii]] (see its scaladoc for the exact
    * equivalence to the lower→strip→collapse regex chain). */
  def fingerprint(text: Column): Column =
    md5(graft.functions.NormalizeAscii.normText(text))

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD'03): hash
    * every char k-gram, slide a window of `w` consecutive hashes, keep
    * each window's minimum; the distinct kept hashes are the document's
    * fingerprint set. Guarantees any shared substring of length
    * >= k + w - 1 contributes at least one common fingerprint.
    *
    * Output: one row per (id, fp). Execution: ZERO shuffles — the whole
    * algorithm is per-document, so it runs scan-side with array
    * higher-order functions (hash array -> per-window `array_min` ->
    * `array_distinct` -> explode). The earlier formulation exploded one
    * row per gram and ran the window-min through a
    * `Window.partitionBy(id)` — a full shuffle+sort of the gram stream
    * whose spill made the 10x->30x probe segment super-linear; the
    * array form is the same O(len*w) work without ever leaving the
    * scan. The hash array is materialized as a BOUND column before the
    * window pass ([[ngramArray]]'s inlining caveat: a computed
    * expression inside the `slice` lambda would re-hash the whole
    * document per window position). The hash is [[Dedup.hash60]]
    * (md5-based) so fingerprints are engine-reproducible; min-in-window
    * selection, not the hash rolling-update trick, is what defines the
    * algorithm. */
  def winnowFingerprints(
      df: DataFrame, idCol: String, textCol: String, k: Int, w: Int,
      maxDocChars: Int = 8 * 1000 * 1000): DataFrame = {
    val t = col(textCol)
    // docs shorter than k+w-1 chars have no FULL window: the row-based
    // formulation emitted their grams and then filtered every one of
    // them on i >= w; filtering the doc up front is value-identical.
    // Docs BEYOND maxDocChars refuse loudly at scan time (raise_error
    // is a codegen'd branch, no extra pass): the fused form holds the
    // whole hash array in ONE row (~8 B/char), so a runaway
    // concatenated-crawl document would OOM the task instead of
    // spilling the way the old exploded-row form did — chunk it first
    // ([[TextPrep.chunkByTokens]]) or raise the cap deliberately.
    val pruned = df.filter(length(t) >= k + w - 1)
      .select(col(idCol).as("id"),
        when(length(t) > maxDocChars,
          raise_error(concat(
            lit("winnowFingerprints: document '"), col(idCol).cast("string"),
            lit(s"' exceeds $maxDocChars chars — the fused hash array " +
              "would hold that many longs in one row; chunk the doc " +
              "first (TextPrep.chunkByTokens) or raise maxDocChars")))
            .cast("string"))
          .otherwise(t).as("__t"))
    // single-split sources would serialize the fused kernel on one
    // core — see [[Spread.toCores]]
    val spread = Spread.toCores(pruned)
    val tt = col("__t")
    spread
      .select(col("id"),
        transform(sequence(lit(1), length(tt) - (k - 1)),
          i => Dedup.hash60(tt.substr(i, lit(k)))).as("__hs"))
      .select(col("id"),
        explode(array_distinct(
          transform(sequence(lit(w), size(col("__hs"))),
            j => array_min(slice(col("__hs"), j - lit(w - 1), lit(w))))))
          .as("fp"))
  }

  /** Word n-gram array over an ALREADY-MATERIALIZED token-array column.
    *
    * `toksCol` must be a bound column (select the `split` into a named
    * column first), NOT the `split(...)` expression itself: expressions
    * passed into a higher-order-function lambda are inlined at every
    * use site and re-evaluated per element — with k element_at calls
    * per position that turns O(len) gram generation into O(k·len)
    * re-splits per row and dominated a corpus scan by two orders of
    * magnitude. One `slice` per position over the materialized array
    * keeps it linear. */
  def ngramArray(toksCol: Column, n: Int): Column =
    when(size(toksCol) >= n,
      transform(
        sequence(lit(1), size(toksCol) - n + 1),
        i => array_join(slice(toksCol, i, lit(n)), " ")))
      .otherwise(array().cast(ArrayType(StringType)))

  /** All-occurrence word n-gram counts over a corpus (the n-gram
    * language-model statistics shape): one scan-side explode (no
    * per-doc distinct — this
    * is the frequency table, not the dedup unit), one partial-aggregated
    * groupBy shuffle. */
  def ngramCounts(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.select(split(col(textCol), " ").as("__toks"))
      .select(explode(ngramArray(col("__toks"), n)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n"))

  /** Per-document cross-entropy under the corpus's own MLE bigram LM
    * (`P(w2|w1) = c(w1 w2) / c(w1 ·)`) — the CCNet-style LM quality
    * filter: documents whose word transitions are improbable under the
    * corpus distribution score high (gibberish, boilerplate-mangled, or
    * off-domain text). Scored against the SAME corpus here, so every
    * observed bigram has mass and no smoothing is needed; swap `cb`/
    * `ctx` for an external LM's count tables to score against a
    * reference corpus.
    *
    * Scale shape: the LM tables are corpus-level aggregates (two
    * partial-aggregated shuffles, vocab-bounded); the per-occurrence
    * stream joins them on `gram`/`w1` — plain equi joins, AQE-splittable
    * when a stop-word bigram is hot — then one groupBy(id). Per-term
    * log-probs round at 6 dp into decimals so the per-doc sum is
    * order-independent and engine-reproducible.
    *
    * @return (id, n_bigrams, xent) — xent = -avg ln P, null for docs
    *         with fewer than 2 tokens */
  def bigramCrossEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val occ = df.select(col(idCol).as("id"), split(col(textCol), " ").as("__toks"))
      .select(col("id"), explode(ngramArray(col("__toks"), 2)).as("gram"))
    // the count table feeds BOTH the bigram join and the context sums;
    // Spark does not dedupe common subplans, so checkpoint the (small,
    // vocab-bounded) counts to tokenize + aggregate the corpus ONCE
    val cb = ngramCounts(df, textCol, 2).localCheckpoint()
    val ctx = cb.groupBy(split(col("gram"), " ").getItem(0).as("w1"))
      .agg(sum(col("n")).as("cn"))
    val scored = occ
      .join(cb, "gram")
      .withColumn("w1", split(col("gram"), " ").getItem(0))
      .join(ctx, "w1")
      .withColumn("lp",
        round(log(col("n").cast(DoubleType) / col("cn").cast(DoubleType)), 6)
          .cast(DecimalType(28, 6)))
    val agg = scored.groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(-sum(col("lp")).cast(DoubleType) / count(lit(1)), 6).as("xent"))
    df.select(col(idCol).as("id")).distinct()
      .join(agg, Seq("id"), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
  }

  /** TF-IDF top-`k` terms per document: `tf * ln(1 + N/df)`, ties on
    * score broken by term so the ranking is deterministic.
    *
    * Shape chosen for scale: term frequencies are a partial-aggregated
    * `groupBy(doc, term)`, document frequencies a second
    * partial-aggregated `groupBy(term)` over the tf rows (a window
    * `count.over(partitionBy(term))` would colocate every row of a hot
    * stopword on one task — the groupBy combiner is what survives
    * skewed vocabularies), reattached with a plain join on `term`
    * (AQE-splittable). The corpus size joins in as a broadcast 1-row
    * aggregate, and the final per-document top-k is a window over the
    * doc partition. Output score is rounded to 6 dp for cross-engine
    * comparability; ordering uses the raw double. */
  def tfidfTopTerms(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df
      .select(col(idCol).as("doc_id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // The tf>=1 guard is a semantic no-op, but it keeps `tf` referenced
    // so column pruning cannot drop the count from this branch's
    // aggregate — both branches then shuffle the IDENTICAL tf stage and
    // AQE reuses one map output instead of tokenizing the corpus twice.
    val dfreq = tf.filter(col("tf") >= 1)
      .groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * log(lit(1.0) + col("n").cast(DoubleType) / col("df")))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("term"),
        round(col("score"), 6).as("tfidf"), col("rk"))
  }

  /** fastText-style hashed linear classifier INFERENCE — the standard
    * web-corpus quality-classifier shape (CCNet/LLaMA-style filtering):
    * each token hashes into one of `buckets` feature slots, the slot's
    * weight accumulates, the per-doc logit decides keep/drop. Inference
    * is a scan-side projection + ONE partial-aggregated shuffle — at
    * 100 TB the classifier costs the same as a token count.
    *
    * Weights here derive deterministically from the bucket id
    * ((bucket % 2001) − 1000 micro-units) so the gate replays
    * cross-engine; a production model replaces that expression with
    * `element_at(<broadcast weight array>, bucket + 1)` — same plan
    * shape. The logit stays in INTEGER micro-units end to end (exact
    * long sums — float accumulation order and exp() ULP differences
    * between engines can never flip a label).
    *
    * @return (id, score_micro, n_toks, label) — label = logit ≥ 0 */
  def hashedLinearScore(
      df: DataFrame, idCol: String, textCol: String,
      buckets: Long = 1L << 20, biasMicro: Long = 0L,
      weightsMicro: Option[Array[Long]] = None): DataFrame = {
    weightsMicro.foreach(w => require(w.length == buckets,
      s"weight table has ${w.length} slots for $buckets buckets"))
    val bucket = pmod(Dedup.hash60(col("tok")), lit(buckets))
    // trained-model path: the weight table folds into the scan
    // projection as a literal array (a broadcast-sized artifact, like
    // the PQ codebook); the derived-weight default keeps the gate
    // replayable without shipping weights into the oracle
    val weight = weightsMicro match {
      case Some(w) => element_at(lit(w), (bucket + 1).cast(IntegerType))
      case None => bucket % 2001 - 1000
    }
    df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col(idCol), weight.as("w"))
      .groupBy(col(idCol))
      .agg((sum(col("w")) + biasMicro).as("score_micro"),
        count(lit(1)).as("n_toks"))
      .withColumn("label", (col("score_micro") >= 0).cast(IntegerType))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text preparation operators for training-data pipelines: token-budget
  * chunking and pattern-based PII scrubbing. Both are pure column
  * expressions (whole-stage codegen, no UDFs, no shuffle) — each is a
  * single narrow scan at any corpus size.
  */
object TextPrep {

  /** Split `textCol` into whitespace tokens and emit overlapping chunks
    * of `chunkSize` tokens with `overlap` tokens shared between
    * neighbors (stride = chunkSize − overlap) — the standard
    * context-window preprocessing for embedding / training pipelines.
    * The last chunk may be shorter; a document never emits zero chunks.
    *
    * Output: (id, chunk_idx, chunk_text, n_tokens), chunk_idx 0-based
    * in document order.
    *
    * Scale shape: split once per row (the token array is bound to a
    * column BEFORE the per-chunk slicing — see the round-3 HOF-inlining
    * lesson in docs/PLANS.md), then one `explode` with fan-out
    * ⌈tokens/stride⌉. No Exchange anywhere: chunking 100 TB is a single
    * embarrassingly parallel scan.
    */
  def chunkByTokens(
      df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(0 <= overlap && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): got $overlap vs $chunkSize")
    val stride = chunkSize - overlap
    // number of stride-steps whose chunk still starts inside the doc:
    // 1 + max(0, ceil((n - chunkSize) / stride)) without float math
    val n = size(col("__toks"))
    val numChunks = lit(1) + greatest(lit(0),
      ((n - chunkSize + stride - 1) / stride).cast(IntegerType))
    df.select(col(idCol).as("id"), col(textCol))
      .withColumn("__toks", split(col(textCol), " "))
      .withColumn("chunk_idx",
        explode(sequence(lit(0), numChunks - 1)))
      .select(
        col("id"), col("chunk_idx"),
        array_join(
          slice(col("__toks"), col("chunk_idx") * stride + 1, lit(chunkSize)),
          " ").as("chunk_text"),
        size(slice(col("__toks"), col("chunk_idx") * stride + 1, lit(chunkSize)))
          .as("n_tokens"))
  }

  /** CCNet/RefinedWeb-style corpus-level boilerplate removal: segment
    * every document into fixed `segTokens`-token pieces, count each
    * distinct segment's document frequency across the corpus, drop
    * segments appearing in more than `maxDocFreq` distinct documents,
    * and reassemble the survivors in document order.
    *
    * Output: (id, clean_text, kept_segments, removed_segments) — one
    * row per input document (a fully-boilerplate document keeps an
    * empty `clean_text` rather than vanishing). A segment repeated
    * WITHIN one document is not boilerplate (document frequency 1).
    *
    * Scale shape: one shuffle to aggregate segment document
    * frequencies, one equi-join back on the segment string (the
    * over-threshold set is small by construction — boilerplate is few
    * distinct strings repeated many times — so AQE collapses this to a
    * broadcast join), one shuffle to reassemble per document. Every
    * stage is linear in corpus size; there is no all-pairs stage.
    */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
      segTokens: Int, maxDocFreq: Int): DataFrame = {
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1: got $maxDocFreq")
    val segs = chunkByTokens(df, idCol, textCol, segTokens, overlap = 0)
    val frequent = segs.groupBy("chunk_text")
      .agg(countDistinct("id").as("seg_df"))
      .filter(col("seg_df") > maxDocFreq)
      .select(col("chunk_text"), lit(true).as("__boiler"))
    segs.join(frequent, Seq("chunk_text"), "left")
      .groupBy(col("id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(col("__boiler").isNull,
              struct(col("chunk_idx"), col("chunk_text"))))),
            _.getField("chunk_text")),
          " ").as("clean_text"),
        count(when(col("__boiler").isNull, 1)).as("kept_segments"),
        count(col("__boiler")).as("removed_segments"))
  }

  /** PII patterns shared by the scrubber and its oracle: RE2-compatible
    * (no backrefs / lookarounds), so Java regex and DuckDB evaluate them
    * identically. Order matters: email first so its digits are not
    * half-eaten by the phone pattern. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b" -> "<PHONE>")

  /** Redact email / IPv4 / phone-shaped spans from `textCol`, appending
    * a `redactions` count (how many replacement tags the scrubbed text
    * contains). Chained `regexp_replace` — codegen'd, no shuffle. A
    * production pipeline extends [[piiPatterns]]; the operator shape
    * (scan-local, order-sensitive chain) is the point. */
  def scrubPii(df: DataFrame, textCol: String,
      outCol: String = "scrubbed"): DataFrame = {
    val scrubbed = piiPatterns.foldLeft(col(textCol)) {
      case (c, (pat, tag)) => regexp_replace(c, pat, tag)
    }
    val redactions = piiPatterns.map { case (_, tag) =>
      // occurrences of tag = (len(text) - len(remove(text, tag))) / len(tag)
      // (tags contain no regex metacharacters, so the pattern is literal)
      (length(col(outCol)) -
        length(regexp_replace(col(outCol), tag, ""))) / tag.length
    }.reduce(_ + _)
    df.withColumn(outCol, scrubbed)
      .withColumn("redactions", redactions.cast(IntegerType))
  }

  /** Canonicalize a URL into its dedup identity — the standard
    * web-corpus pre-filter (CommonCrawl-style URL dedup keys on this):
    * scheme, `www.`, fragments, tracking parameters (`utm_*`, fbclid,
    * gclid, ref), trailing slashes, and query-parameter ORDER are
    * presentation noise, not document identity. Pure codegen'd column
    * expressions (regex + array sort over the split query) — runs at
    * scan speed, no shuffle; the dedup itself is then an ordinary
    * keep-best groupBy on the canonical key. */
  def canonicalizeUrl(url: Column): Column = {
    val noScheme = regexp_replace(lower(trim(url)), "^https?://", "")
    val noWww = regexp_replace(noScheme, "^www\\.", "")
    val noFrag = regexp_replace(noWww, "#.*$", "")
    val base = regexp_replace(regexp_replace(noFrag, "\\?.*$", ""), "/+$", "")
    val query = when(instr(noFrag, "?") > 0,
      regexp_replace(noFrag, "^[^?]*\\?", "")).otherwise(lit(""))
    val params = array_sort(filter(split(query, "&"),
      p => !p.rlike("^(utm_[^=]*|fbclid|gclid|ref)=") && p =!= ""))
    val joined = array_join(params, "&")
    concat(base,
      when(length(joined) > 0, concat(lit("?"), joined)).otherwise(lit("")))
  }
}

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
    * Output: one row per (id, fp). Execution: explode positions at scan
    * (no shuffle), ONE hash shuffle on id for the per-document sliding
    * window + distinct — partitions by document, so 100 TB of docs
    * spreads evenly. The hash is [[Dedup.hash60]] (md5-based) so
    * fingerprints are engine-reproducible; min-in-window selection, not
    * the hash rolling-update trick, is what defines the algorithm. */
  def winnowFingerprints(
      df: DataFrame, idCol: String, textCol: String, k: Int, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = col(textCol)
    val positions = sequence(lit(1), length(t) - (k - 1))
    val win = Window.partitionBy(col("id")).orderBy(col("i"))
      .rowsBetween(-(w - 1), 0)
    df.filter(length(t) >= k)
      .select(col(idCol).as("id"), t.as("t"), explode(positions).as("i"))
      .select(col("id"), col("i"),
        Dedup.hash60(col("t").substr(col("i"), lit(k))).as("h"))
      .withColumn("fp", min(col("h")).over(win))
      .filter(col("i") >= w) // full windows only
      .select(col("id"), col("fp"))
      .distinct()
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer semantics on a hand-computable corpus (the classic
  * Sennrich example shape) + encoding round-trip + exhaustion stop. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)
  import graft.ops.Bpe

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("merges follow max-count with (count DESC, pair ASC) tie order") {
    // words: low x5, lower x2, newest x6, widest x3
    val docs = corpus(
      1L -> (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" "),
      2L -> (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    val merges = Bpe.train(spark, docs, "text", 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // hand-derived: es(9), est(9), e-st? no: after es, (e,s)->es, pairs:
    // n-e 6, e-w 6, w-es 6(newest) ... recompute: newest = n e w e s t,
    // widest = w i d e s t; (e,s) appears in both → 9; then (es,t) → 9.
    assert(merges(0)._2 == "e" && merges(0)._3 == "s" && merges(0)._4 == 9L)
    assert(merges(1)._2 == "es" && merges(1)._3 == "t" && merges(1)._4 == 9L)
    // low x5 + lower x2: (l,o) = 7, (o,w) = 7 — tie breaks pair-ASC
    // against the newest-side pairs of equal count
    val counts = merges.map(_._4)
    assert(counts.sorted.reverse.sameElements(counts), "counts must be non-increasing")
  }

  test("greedy merge application: overlapping runs merge left-to-right") {
    // 'aaaa' with merge (a,a): greedy pairs → [aa, aa], NOT [a, aa, a]
    val docs = corpus(1L -> "aaaa aaaa aaaa")
    val m = Bpe.train(spark, docs, "text", 1).collect()(0)
    assert(m.getString(1) == "a" && m.getString(2) == "a")
    val enc = Bpe.encodeWords(
      corpus(1L -> "ignored").select(lit("aaaa").as("w")), "w",
      Seq(("a", "a")))
      .select(col("tokens")).collect()(0).getSeq[String](0)
    assert(enc == Seq("aa", "aa"))
  }

  test("trainLocalWithVocab equals trainWithVocab: merges AND final vocab") {
    val docs = corpus(
      1L -> (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" "),
      2L -> (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "),
      3L -> "the quick brown fox jumps over the lazy dog the end",
      4L -> (Seq.fill(4)("aaaa") ++ Seq.fill(3)("abab")).mkString(" "))
    val (mDist, vDist) = Bpe.trainWithVocab(spark, docs, "text", 12)
    val (mLoc, vLoc) = Bpe.trainLocalWithVocab(spark, docs, "text", 12)
    val a = mDist.orderBy("rank").collect().map(_.toSeq).toSeq
    val b = mLoc.orderBy("rank").collect().map(_.toSeq).toSeq
    assert(a == b, s"merge lists diverge:\n dist=$a\n loc =$b")
    assert(vDist.exceptAll(vLoc).isEmpty && vLoc.exceptAll(vDist).isEmpty,
      "final vocab symbol strings diverge")
  }

  test("trainLocalWithVocab refuses a vocab beyond maxWords (no silent OOM)") {
    val docs = corpus(1L -> "one two three four five")
    val e = intercept[IllegalArgumentException] {
      Bpe.trainLocalWithVocab(spark, docs, "text", 2, maxWords = 3)
    }
    assert(e.getMessage.contains("distinct words"))
  }

  test("training stops when no pairs remain (single-char vocab)") {
    val docs = corpus(1L -> "a b c a b")
    val merges = Bpe.train(spark, docs, "text", 10).collect()
    assert(merges.isEmpty, s"no adjacent pairs exist, got ${merges.length} merges")
  }

  test("empty and non-alphabetic corpora train zero merges") {
    assert(Bpe.train(spark, corpus(), "text", 5).collect().isEmpty)
    assert(Bpe.train(spark, corpus(1L -> "123 456 !!"), "text", 5)
      .collect().isEmpty)
  }

  test("re-root cadence is value-invisible (exercises the plan-cut branch)") {
    val docs = corpus(
      1L -> (Seq.fill(4)("lower") ++ Seq.fill(3)("newest") ++
        Seq.fill(2)("widest") ++ Seq.fill(5)("lowest")).mkString(" "))
    val (defA, _) = Bpe.trainWithVocab(spark, docs, "text", numMerges = 6)
    val (defB, _) = Bpe.trainWithVocab(spark, docs, "text", numMerges = 6,
      rerootEvery = 2) // forces the persist+re-root path three times
    val a = defA.orderBy("rank").collect().map(_.toSeq).toSeq
    val b = defB.orderBy("rank").collect().map(_.toSeq).toSeq
    assert(a == b, s"re-root cadence changed the merges:\n$a\nvs\n$b")
  }

  test("encodeWords with the learned merges reproduces the trainer's vocab state") {
    val docs = corpus(
      1L -> (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" "),
      2L -> (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    val (mergesDf, vocab) = Bpe.trainWithVocab(spark, docs, "text", 6)
    val merges = mergesDf.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val reEncoded = Bpe.encodeWords(vocab.select(col("word"), col("n")), "word", merges)
      .select(col("word"), concat(lit("|"),
        concat_ws("||", col("tokens")), lit("|")).as("s2"))
    val drift = vocab.join(reEncoded, "word")
      .filter(col("s") =!= col("s2")).count()
    assert(drift == 0, "encode(word, merges) must equal the trainer's final state")
  }
}

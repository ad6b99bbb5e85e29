package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** Scale-shape guarantees of the dedup operators: the document-frequency
  * cut must keep a hot (stop-word-grade) token from degenerating the
  * inverted-index self-join into ~O(n²) candidate pairs. */
class DedupScaleSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  private def hotCorpus = {
    import spark.implicits._
    // every doc shares "hot"; docs 58/59 additionally share rare tokens
    val rows = (0 until 58).map(i => (i.toLong, s"hot u$i v$i")) ++
      Seq((58L, "hot dupa dupb"), (59L, "hot dupa dupb"))
    rows.toDF("id", "text")
  }

  test("one ubiquitous token creates quadratic candidates; the df cut removes them") {
    val t = Dedup.tokens(hotCorpus, "id", "text")
    def candidatePairs(tt: org.apache.spark.sql.DataFrame): Long =
      tt.as("a").join(tt.as("b"),
          col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
        .count()
    // without the cut: "hot" alone contributes C(60,2) pairs
    assert(candidatePairs(t) >= 60L * 59 / 2)
    // with the cut: only the rare tokens remain — exactly the one real
    // dup pair, reached via its 2 shared tokens
    assert(candidatePairs(Dedup.dfCutTokens(t, 10)) == 2L)
  }

  test("64-bit simhash banding: candidate volume tracks the true-pair count, not n²") {
    import spark.implicits._
    // 100 unrelated docs (disjoint vocabularies -> ~uniform signatures)
    // plus 5 cloned pairs (identical token sets -> Hamming 0)
    val unrelated = (0 until 100).map { i =>
      (i.toLong, (0 until 12).map(j => s"d${i}w$j").mkString(" "))
    }
    val clones = (0 until 5).flatMap { p =>
      val text = (0 until 12).map(j => s"c${p}w$j").mkString(" ")
      Seq((1000L + 2 * p, text), (1001L + 2 * p, text))
    }
    val df = (unrelated ++ clones).toDF("id", "text")

    // signatures use the full 64-bit width (bit 63 in play -> some negative)
    val sigs = Dedup.simHash64(df, "id", "text").collect().map(_.getLong(1))
    assert(sigs.exists(_ < 0L) && sigs.exists(_ > (1L << 32)))

    // banded result == brute force over the same signatures (exact recall)
    val sig = Dedup.simHash64(df, "id", "text")
    val brute = sig.as("a").join(sig.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("int").as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val banded = Dedup.simHashNearDupPairs(df, "id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute)
    assert(brute.size >= 5) // the 5 clone pairs are all found

    // the scale property the 16-bit demo lacked: candidate volume stays
    // near the true-pair count — a 16-bit/4-nibble banding would have
    // produced ~C(110,2)/64 ≈ 94+ coincidental candidates here, 16-bit
    // bands produce ~C(110,2)·4/2^16 ≈ 0.37 expected
    val cands = Dedup.simHashCandidates(df, "id", "text", maxHamming = 3).count()
    assert(cands <= brute.size + 5, s"candidates=$cands truePairs=${brute.size}")
  }

  test("simhash banding on the REAL gated corpus: candidates track true pairs") {
    // The q_simhash_pairs gate runs on the synthetic documents table,
    // whose 31-token vocabulary makes documents near-duplicates en masse
    // (a disjoint-vocab fixture can't exhibit this — round-5 advisory).
    // The scale property to hold HERE is candidates ∝ true pairs: banding
    // may only inflate the genuinely-similar pair volume by a small
    // constant, even when that volume is itself large.
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 500).select(col("doc_id").as("id"), col("text"))
    val truePairs = Dedup.simHashNearDupPairs(real, "id", "text", maxHamming = 3).count()
    val cands = Dedup.simHashCandidates(real, "id", "text", maxHamming = 3).count()
    val n = real.count()
    assert(truePairs > 0, "gate corpus should contain near-dup pairs")
    assert(cands <= 25L * (truePairs + n),
      s"candidate volume $cands not ∝ true pairs $truePairs (n=$n) — banding degenerated")
  }

  test("blocked fuzzy matching: same pairs as the nested loop, no nested loop in the plan") {
    import spark.implicits._
    val rows = Seq("martha", "marsha", "martin", "martini", "zelda",
      "zeldda", "qqqq", "wwww").flatMap(n => Seq(n, n)) // 2 rows per name
    val df = rows.toDF("name")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).toSet
    val loop = canon(Dedup.fuzzyVocabPairs(df, "name", maxDist = 2))
    val blocked = canon(Dedup.fuzzyVocabPairsBlocked(df, "name", maxDist = 2))
    assert(blocked == loop)
    assert(loop.contains(("marsha", "martha", 1, 2L, 2L)))
    // the point of the variant: candidates come from an EQUI join on the
    // deletion-neighborhood key — no broadcast nested loop anywhere
    val plan = Dedup.fuzzyVocabPairsBlocked(df, "name", maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("jaccard degree with df cut still finds the rare-token dup pair") {
    val deg = Dedup.jaccardNearDupDegree(hotCorpus, "id", "text",
        threshold = 0.5, maxDocFreq = Some(10))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deg.size == 60) // every doc present, partnerless docs at 0
    assert(deg(58L) == 1 && deg(59L) == 1)
    assert((0 until 58).forall(i => deg(i.toLong) == 0))
  }

  test("cross-corpus dedup reports only history×batch pairs, never within-side ones") {
    import spark.implicits._
    // history: two identical docs (a within-history pair that must NOT
    // appear) + one doc duplicated into the batch
    val history = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta")).toDF("id", "text")
    // batch: a near-dup of history doc 3, an exact within-batch pair
    // (also must NOT appear), and an unrelated doc
    val batch = Seq(
      (10L, "epsilon zeta eta theta"),
      (11L, "iota kappa lambda mu"),
      (12L, "iota kappa lambda mu"),
      (13L, "nu xi omicron pi")).toDF("id", "text")
    val got = Dedup.minHashLshPairsAgainst(history, batch, "id", "text",
        numPerms = 6, bandSize = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((3L, 10L, 1.0)),
      s"expected exactly the history->batch duplicate, got $got")
  }

  test("exact-substring dedup removes duplicated spans, keeps unique context") {
    import spark.implicits._
    // docs 1 and 2 share a verbatim 4-token run ("the quick brown fox")
    // embedded in otherwise-different text; doc 3 is untouched; doc 4
    // is a full copy of the shared run only (vanishes entirely); doc 5
    // repeats a 4-gram WITHIN itself (self-duplication also counts)
    val docs = Seq(
      (1L, "alpha beta the quick brown fox gamma delta"),
      (2L, "one two three the quick brown fox four"),
      (3L, "totally unique words here nothing shared"),
      (4L, "the quick brown fox"),
      (5L, "x1 a b c d x2 a b c d x3")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "doc_id", "text", n = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(out(0) == ((1L, "alpha beta gamma delta", 4L, 8)))
    assert(out(1) == ((2L, "one two three four", 4L, 8)))
    assert(out(2) == ((3L, "totally unique words here nothing shared", 6L, 6)))
    assert(out(3) == ((4L, "", 0L, 4)), "fully-covered doc returns empty, not missing")
    assert(out(4) == ((5L, "x1 x2 x3", 3L, 11)),
      "within-doc repetition is duplication too")
  }

  test("persisted index probe equals the inline computation bit-for-bit") {
    import spark.implicits._
    import graft.ops.Dedup
    val hist = Seq(
      (1L, "alpha beta gamma delta"), (2L, "one two three four"),
      (3L, "red green blue yellow")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "red green blue yellow"), (11L, "totally unrelated words here"),
      (12L, "one two three four five")).toDF("doc_id", "text")
    val idx = "/tmp/graft_dedupidx_spec"
    Dedup.writeMinHashIndex(hist, "doc_id", "text",
      numPerms = 6, bandSize = 3, maxBucket = Some(100), idx)
    val probed = Dedup.probeMinHashIndex(spark, idx, batch, "doc_id", "text", 0.7)
    val inline = Dedup.minHashLshPairsAgainst(hist, batch, "doc_id", "text",
      numPerms = 6, bandSize = 3, threshold = 0.7, maxBucket = Some(100))
    assert(probed.exceptAll(inline).isEmpty && inline.exceptAll(probed).isEmpty,
      "index probe must equal inline incremental dedup")
    assert(probed.count() >= 2, "fixture must produce matches (exact + superset)")
    // probing params come FROM the index — a missing marker fails loudly
    intercept[java.io.FileNotFoundException] {
      Dedup.probeMinHashIndex(spark, "/tmp/graft_dedupidx_nope", batch,
        "doc_id", "text", 0.7)
    }
  }
}

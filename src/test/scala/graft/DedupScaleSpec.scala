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

  test("jaccard degree with df cut still finds the rare-token dup pair") {
    val deg = Dedup.jaccardNearDupDegree(hotCorpus, "id", "text",
        threshold = 0.5, maxDocFreq = Some(10))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deg.size == 60) // every doc present, partnerless docs at 0
    assert(deg(58L) == 1 && deg(59L) == 1)
    assert((0 until 58).forall(i => deg(i.toLong) == 0))
  }
}

package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property check: the Spark BPE trainer agrees with an independent
  * in-memory reference (classic Sennrich trainer: per-word symbol
  * lists, overlapping pair counts, greedy left-to-right merge, ties by
  * (count DESC, left ASC, right ASC)) on random corpora — including
  * runs of repeated characters, the case the wrapped-symbol encoding
  * exists for. Uses the raw ScalaCheck runner (no scalatestplus bridge
  * in the offline dependency set). */
class BpePropSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  private def referenceTrain(
      words: Map[String, Long], numMerges: Int): Seq[(String, String, Long)] = {
    var vocab: Map[String, Vector[String]] =
      words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val merges = Vector.newBuilder[(String, String, Long)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val stats = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- vocab; i <- 0 until syms.length - 1)
        stats((syms(i), syms(i + 1))) = stats.getOrElse((syms(i), syms(i + 1)), 0L) + words(w)
      if (stats.isEmpty) done = true
      else {
        val ((l, rg), c) = stats.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((l, rg, c))
        vocab = vocab.map { case (w, syms) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == rg) {
              out += (l + rg); i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> out.result()
        }
        r += 1
      }
    }
    merges.result()
  }

  private val wordGen: Gen[String] = for {
    n <- Gen.choose(1, 8)
    // tiny alphabet + repeat-heavy words: forces ties and greedy runs
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  test("trainer equals the in-memory reference on random repeat-heavy corpora") {
    import spark.implicits._
    val corpusGen = Gen.listOfN(30, wordGen)
    val prop = Prop.forAllNoShrink(corpusGen) { ws =>
      val docs = Seq((1L, ws.mkString(" "))).toDF("doc_id", "text")
      val got = graft.ops.Bpe.train(spark, docs, "text", numMerges = 5)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val counts = ws.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val want = referenceTrain(counts, 5)
      if (got != want)
        println(s"[bpeprop] MISMATCH corpus=$ws\n got=$got\n want=$want")
      got == want
    }
    // each trial runs 5 Spark aggregations; keep the trial count small
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}

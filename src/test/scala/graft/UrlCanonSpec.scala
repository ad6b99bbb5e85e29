package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TextPrep.canonicalizeUrl invariants: idempotence, noise-class
  * insensitivity, and identity preservation — plus
  * Dedup.removeDuplicateSpans accounting invariants over seeded random
  * corpora. */
class UrlCanonSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)
  import graft.ops.TextPrep

  private def canonOf(urls: Seq[String]): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(TextPrep.canonicalizeUrl(col("u")).as("c"))
      .as[String].collect().toSeq
  }

  test("canonicalization is idempotent and merges every noise class") {
    val variants = Seq(
      "https://www.Example.com/a/b?utm_source=x&q=1&a=2",
      "http://example.com/a/b?a=2&q=1",
      "https://example.com/a/b/?q=1&a=2#section",
      "HTTPS://WWW.EXAMPLE.COM/a/b?a=2&utm_campaign=z&q=1&fbclid=abc")
    val canons = canonOf(variants).distinct
    assert(canons == Seq("example.com/a/b?a=2&q=1"),
      s"all variants must canonicalize to one key: $canons")
    // idempotent: canonicalizing the canonical form is a no-op
    assert(canonOf(canons) == canons)
  }

  test("distinct identities stay distinct (no over-merging)") {
    val urls = Seq(
      "https://example.com/a/b?q=1",
      "https://example.com/a/b?q=2",   // different param VALUE
      "https://example.com/a/c?q=1",   // different path
      "https://other.com/a/b?q=1")     // different host
    assert(canonOf(urls).distinct.length == 4)
  }

  test("substring dedup accounting: kept + covered == total, per doc, on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = ('a' to 'j').map(_.toString)
    val docs = (0L until 40L).map { i =>
      val len = 6 + rnd.nextInt(20)
      (i, Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val n = 4
    val out = graft.ops.Dedup.removeDuplicateSpans(docs, "doc_id", "text", n)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(out.length == 40)
    for ((id, text, kept, total) <- out) {
      val keptToks = if (text.isEmpty) 0 else text.split(" ").length
      assert(keptToks == kept, s"doc $id: text/count mismatch")
      assert(kept <= total, s"doc $id: kept exceeds total")
    }
    // tiny vocab + random text ⇒ some duplicated 4-grams must exist
    assert(out.exists(r => r._3 < r._4), "expected some removal on a 10-token vocab")
    // and kept tokens are a SUBSEQUENCE of the original (order preserved)
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, text, _, _) <- out if text.nonEmpty) {
      val o = orig(id).split(" ")
      var j = 0
      for (t <- text.split(" ")) {
        while (j < o.length && o(j) != t) j += 1
        assert(j < o.length, s"doc $id: '$t' out of order vs original")
        j += 1
      }
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{TextAnalysis, TextPrep}

class TextPrepSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(2)

  test("chunking: overlap, short docs, exact multiples, 0-overlap") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks
      (2L, "a b"),                                    // shorter than chunk
      (3L, (1 to 8).map(i => s"u$i").mkString(" ")),  // exactly one chunk
      (4L, (1 to 14).map(i => s"v$i").mkString(" "))  // 8 + stride 6 = 14: 2 full
    ).toDF("doc_id", "text")
    val out = TextPrep.chunkByTokens(df, "doc_id", "text", chunkSize = 8, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2))
    // doc 1: chunks [t1..t8], [t7..t10] (starts at stride 6)
    assert(out.filter(_._1 == 1L).map(_._3).toSeq ==
      Seq((1 to 8).map("t" + _).mkString(" "), (7 to 10).map("t" + _).mkString(" ")))
    assert(out.filter(_._1 == 1L).map(_._4).toSeq == Seq(8, 4))
    // doc 2: one short chunk, never zero chunks
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, "a b", 2)))
    // doc 3: exactly one full chunk, no empty trailing chunk
    assert(out.count(_._1 == 3L) == 1)
    // doc 4: exactly two full chunks
    assert(out.filter(_._1 == 4L).map(_._4).toSeq == Seq(8, 8))
    // overlap property: chunk k shares its first `overlap` tokens with
    // the tail of chunk k-1
    val d1 = out.filter(_._1 == 1L)
    assert(d1(1)._3.split(" ").take(2).toSeq == d1(0)._3.split(" ").takeRight(2).toSeq)

    // 0-overlap partitions the tokens exactly
    val noOv = TextPrep.chunkByTokens(df.filter($"doc_id" === 1), "doc_id", "text", 4, 0)
      .agg(sum("n_tokens")).collect()(0).getLong(0)
    assert(noOv == 10L)
    intercept[IllegalArgumentException] {
      TextPrep.chunkByTokens(df, "doc_id", "text", chunkSize = 4, overlap = 4)
    }
  }

  test("boilerplate: cross-doc segments removed, within-doc repeats kept, order preserved") {
    import spark.implicits._
    val df = Seq(
      (1L, "x y x y a b"),         // "x y" repeats only WITHIN doc 1 -> kept
      (2L, "c d e f"),             // "c d" shared by docs 2,3,4,5 -> removed
      (3L, "c d g h"),
      (4L, "c d"),                 // fully boilerplate -> empty clean_text
      (5L, "c d m n c d p q")      // kept segments non-contiguous -> order check
    ).toDF("doc_id", "text")
    val out = TextPrep.removeBoilerplate(df, "doc_id", "text", segTokens = 2, maxDocFreq = 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == (("x y x y a b", 3L, 0L)))
    assert(out(2L) == (("e f", 1L, 1L)))
    assert(out(3L) == (("g h", 1L, 1L)))
    assert(out(4L) == (("", 0L, 1L)))   // doc survives with empty text
    assert(out(5L) == (("m n p q", 2L, 2L)))
    assert(out.size == 5)
    intercept[IllegalArgumentException] {
      TextPrep.removeBoilerplate(df, "doc_id", "text", segTokens = 2, maxDocFreq = 0)
    }
  }

  test("boilerplate plan: two aggregate Exchanges + broadcast join-back; chunking stays scan-local") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "a b e f")).toDF("doc_id", "text")
    // chunking alone adds NO Exchange — a single narrow scan
    val chunkPlan = TextPrep.chunkByTokens(df, "doc_id", "text", 2, 0)
      .queryExecution.executedPlan.toString
    assert(!chunkPlan.contains("Exchange"), s"chunking must not shuffle:\n$chunkPlan")
    // boilerplate = segment-df aggregate + per-doc reassembly aggregate;
    // the join back against the (small) frequent set must broadcast
    val plan = TextPrep.removeBoilerplate(df, "doc_id", "text", 2, 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"frequent-segment join-back should broadcast:\n$plan")
    val shuffles = plan.split("Exchange hashpartitioning").length - 1
    assert(shuffles <= 3, s"expected the two aggregate shuffles (+AQE), got $shuffles:\n$plan")
  }

  test("composed prep pipeline (rule gate -> scrub -> chunk) stays a single narrow stage") {
    import spark.implicits._
    val df = Seq((2L, ((1 to 30).map(i => s"w$i").mkString(" ")
      + " the u2@mail.example.com"))).toDF("doc_id", "text")
    val passed = df.filter(size(TextAnalysis.ruleFailures($"text")) === 0)
    val scrubbed = TextPrep.scrubPii(
      passed.select($"doc_id".as("id"), $"text"), "text")
    val plan = TextPrep.chunkByTokens(
        scrubbed.select($"id", $"scrubbed"), "id", "scrubbed", 8, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"prep pipeline must not shuffle:\n$plan")
  }

  test("scrubbing: each pattern redacts, counts match, clean text untouched") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail me at jo.doe+x@sub.example.org thanks"),
      (2L, "server 10.0.255.3 rebooted"),
      (3L, "call 555-867-5309 or 555.123.4567"),
      (4L, "no pii here at all"),
      (5L, "a@b.co and 1.2.3.4 and 555-000-1111")
    ).toDF("id", "text")
    val out = TextPrep.scrubPii(df, "text").collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[String]("scrubbed"), r.getAs[Int]("redactions")))
      .toMap
    assert(out(1L) == ("mail me at <EMAIL> thanks", 1))
    assert(out(2L) == ("server <IP> rebooted", 1))
    assert(out(3L) == ("call <PHONE> or <PHONE>", 2))
    assert(out(4L) == ("no pii here at all", 0))
    assert(out(5L) == ("<EMAIL> and <IP> and <PHONE>", 3))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, TextAnalysis}

class TextOpsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  test("ngramTokens: shingles preserve order; short docs yield no grams") {
    import spark.implicits._
    val df = Seq((1, "a b c"), (2, "c b a"), (3, "solo"), (4, "x x x"))
      .toDF("id", "text")
    val grams = Dedup.ngramTokens(df, "id", "text", 2)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(grams == Set(
      (1, "a b"), (1, "b c"),
      (2, "c b"), (2, "b a"),
      (4, "x x"))) // distinct within doc; id=3 below n tokens -> none
  }

  test("winnowing: identical docs share fingerprints, short docs drop out") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog"
    val df = Seq((1, text), (2, text), (3, "tiny")).toDF("id", "text")
    val fps = TextAnalysis.winnowFingerprints(df, "id", "text", k = 8, w = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val byId = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(!byId.contains(3)) // shorter than k
    assert(byId(1) == byId(2) && byId(1).nonEmpty)
    // winnowing selects far fewer fingerprints than there are k-grams
    assert(byId(1).size < text.length - 8 + 1)
  }

  test("NormalizeAscii equals the lower→strip→collapse regex chain") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val samples = Seq(
      "Hello,  World!  123",
      "  leading and trailing  ",
      "UPPER lower MiXeD",
      "punct...only!!!",
      "",
      "tabs\tand\nnewlines stay out",
      "汉字 mixed with ASCII Text 42",
      "àccénts Übermäßig ÇA",
      "a  b   c    d",
      "ALL CAPS WITH 999 DIGITS")
    val df = samples.toDF("t").select(
      graft.functions.NormalizeAscii.normText($"t").as("fast"),
      regexp_replace(regexp_replace(lower($"t"), "[^a-z0-9 ]", ""), " +", " ").as("ref"))
    // both the codegen path (collect) and the SQL-registered function
    df.collect().foreach(r => assert(r.getString(0) == r.getString(1), r))
    samples.zipWithIndex.foreach { case (s, i) =>
      val esc = s.replace("\\", "\\\\").replace("'", "\\'").replace("\n", "\\n").replace("\t", "\\t")
      val Array(a, b) = spark.sql(
        s"SELECT norm_text('$esc'), regexp_replace(regexp_replace(lower('$esc'), '[^a-z0-9 ]', ''), ' +', ' ')")
        .collect()(0).toSeq.map(_.asInstanceOf[String]).toArray
      assert(a == b, s"sample $i")
    }
  }
}

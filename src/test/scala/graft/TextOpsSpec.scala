package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, TextAnalysis}

class TextOpsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  test("hashedLinearScore: trained-weight path equals hand-computed logits") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val buckets = 64L
    // a tiny "trained model": slot weights derived but EXPLICIT
    val weights = Array.tabulate(64)(i => (i * 31 % 2001 - 1000).toLong)
    val docs = Seq((1L, "alpha beta alpha"), (2L, "gamma")).toDF("id", "text")
    val got = TextAnalysis.hashedLinearScore(
      docs, "id", "text", buckets, biasMicro = 7L, Some(weights))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // hand-compute: bucket = hash60(tok) % 64, weight from the table
    def h(tok: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % 64).toInt
    }
    val s1 = weights(h("alpha")) * 2 + weights(h("beta")) + 7
    val s2 = weights(h("gamma")) + 7
    assert(got(0) == ((1L, s1, 3L, if (s1 >= 0) 1 else 0)))
    assert(got(1) == ((2L, s2, 1L, if (s2 >= 0) 1 else 0)))
    // weight-table size must match the bucket count
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.hashedLinearScore(docs, "id", "text", 128L,
        weightsMicro = Some(weights))
    }
    assert(e.getMessage.contains("slots"))
  }

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

  test("tfidfTopTerms: hand-computed scores, deterministic tie-break") {
    import spark.implicits._
    // 3 docs; "common" in all (df=3), "rare" only in doc 1 (df=1),
    // "pair" in docs 2+3 (df=2). Doc 1 repeats "rare" twice.
    val df = Seq(
      (1L, "common rare rare"),
      (2L, "common pair"),
      (3L, "common pair")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .collect().map(r => ((r.getLong(0), r.getInt(3)), (r.getString(1), r.getDouble(2))))
      .toMap
    def score(tf: Long, dfreq: Long) =
      BigDecimal(tf * math.log1p(3.0 / dfreq))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got((1L, 1)) == ("rare", score(2, 1)))   // 2*ln(4) beats ln(2)
    assert(got((1L, 2)) == ("common", score(1, 3)))
    // docs 2/3: pair (ln 2.5) beats common (ln 2)
    assert(got((2L, 1)) == ("pair", score(1, 2)))
    assert(got((3L, 2)) == ("common", score(1, 3)))
  }

  test("fuzzyVocabPairs: length guard and distance bound") {
    import spark.implicits._
    val df = Seq("red bolt", "red bolt", "rod bolt", "red colt",
      "blue anvil", "blue anvi", "completely different")
      .zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "name")
    val got = graft.ops.Dedup.fuzzyVocabPairs(df, "name", maxDist = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == Set(
      ("red bolt", "rod bolt", 1, 2L, 1L),   // rows_a=2 (dup "red bolt")
      ("red bolt", "red colt", 1, 2L, 1L),
      ("red colt", "rod bolt", 2, 1L, 1L),
      ("blue anvi", "blue anvil", 1, 1L, 1L)))
  }

  test("bigramCrossEntropy: hand-computed MLE log-probs, short docs null") {
    import spark.implicits._
    // corpus bigrams: "a b" x2, "a c" x1; c(w1 = a) = 3
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "solo"))
      .toDF("id", "text")
    val out = TextAnalysis.bigramCrossEntropy(df, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(out.size == 4)
    assert(out(1L)._1 == 1L && math.abs(out(1L)._2.get - 0.405465) < 1e-6) // -ln(2/3)
    assert(out(2L) == out(1L))
    assert(out(3L)._1 == 1L && math.abs(out(3L)._2.get - 1.098612) < 1e-6) // -ln(1/3)
    assert(out(4L) == ((0L, None))) // no bigrams -> null score
  }

  test("ruleFailures: each rule fires independently; clean doc passes; names sorted") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val clean = (1 to 30).map(i => s"w$i").mkString(" ") + " the"  // 31 distinct toks
    val df = Seq(
      (1L, clean),
      (2L, "the a b"),                                         // too few
      (3L, ((1 to 91).map(i => s"w$i").mkString(" ") + " the")), // too many
      (4L, (1 to 30).map(_ => "the").mkString(" ")),           // low ttr (1/30)
      (5L, (1 to 24).map(i => s"longword$i").mkString(" ") + " the")  // mwl>5, 25 toks
    ).toDF("id", "text")
    val out = df.select($"id",
        TextAnalysis.ruleFailures($"text").as("f"),
        (size(TextAnalysis.ruleFailures($"text")) === 0).as("p"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getBoolean(2)))).toMap
    assert(out(1L) == ((Seq(), true)))
    assert(out(2L) == ((Seq("too_few_tokens"), false)))
    assert(out(3L) == ((Seq("too_many_tokens"), false)))
    assert(out(4L) == ((Seq("low_ttr"), false)))
    assert(out(5L)._1.contains("mean_word_len") && !out(5L)._2)
    // multiple failures arrive sorted
    val multi = df.sparkSession.createDataFrame(Seq(Tuple1("zz zz zz zz")))
      .toDF("text")
      .select(TextAnalysis.ruleFailures($"text").as("f"))
      .collect()(0).getSeq[String](0)
    // ttr 1/4 < 0.35, 4 toks < 25, no stopword — and the names sort
    assert(multi == Seq("low_ttr", "no_stopword", "too_few_tokens"))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  private lazy val binDf = Tables.documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))

  test("extractFeatures: schema, determinism, and byte-accurate meta") {
    val out = Multimodal.extractFeatures(binDf, "doc_id", "content", dims = 16)
    assert(out.schema.fieldNames.toSeq == Seq("doc_id", "meta", "features"))
    val r = out.filter("doc_id = 0").collect()(0)
    val meta = r.getStruct(1)
    val txt = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter("doc_id = 0").collect()(0).getAs[String]("text")
    assert(meta.getInt(0) == txt.getBytes("UTF-8").length)
    val b0 = txt.getBytes("UTF-8")(0) & 0xff
    assert(meta.getInt(1) == 64 + b0 % 64)
    assert(r.getSeq[Float](2).length == 16)
    // deterministic across runs
    val again = Multimodal.extractFeatures(binDf, "doc_id", "content", dims = 16)
      .filter("doc_id = 0").collect()(0)
    assert(again.getSeq[Float](2) == r.getSeq[Float](2))
  }

  test("resizeImages: target dims pinned, payload sized w*h*c, deterministic") {
    val out = Multimodal.resizeImages(binDf, "doc_id", "content", 32, 16)
    assert(out.schema.fieldNames.toSeq == Seq("doc_id", "content", "meta"))
    val r = out.filter("doc_id = 0").collect()(0)
    val meta = r.getStruct(2)
    assert(meta.getInt(1) == 32 && meta.getInt(2) == 16)
    val bytes = r.getAs[Array[Byte]](1)
    assert(bytes.length == 32 * 16 * meta.getInt(3))
    val again = Multimodal.resizeImages(binDf, "doc_id", "content", 32, 16)
      .filter("doc_id = 0").collect()(0).getAs[Array[Byte]](1)
    assert(java.util.Arrays.equals(bytes, again))
  }

  test("sampleFrames: strided fixed-size blocks") {
    val out = Multimodal.sampleFrames(binDf, "doc_id", "content", frameBytes = 16, stride = 2)
    val r = out.filter("doc_id = 0").collect()
    val len = binDf.filter("doc_id = 0").collect()(0).getAs[Array[Byte]]("content").length
    val expected = (0 until len / 16 by 2).size
    assert(r.length == expected)
    assert(r.forall(_.getAs[Array[Byte]]("frame").length == 16))
  }

  private def png2x2: Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000) // red
    img.setRGB(1, 0, 0x00ff00) // green
    img.setRGB(0, 1, 0x0000ff) // blue
    img.setRGB(1, 1, 0xffffff) // white
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG payload decodes with the JDK codec — exact dims and meta") {
    val png = png2x2
    assert(Multimodal.decodeMeta(png) == ((2, 2, 3)))
    import spark.implicits._
    val df = Seq((0L, png)).toDF("doc_id", "content")
    val r = Multimodal.extractFeatures(df, "doc_id", "content", dims = 4).collect()(0)
    val meta = r.getStruct(1)
    assert(meta.getInt(0) == png.length)
    assert(meta.getInt(1) == 2 && meta.getInt(2) == 2 && meta.getInt(3) == 3)
    // 2x2 grid over a 2x2 image = per-pixel luminance / 255
    val f = r.getSeq[Float](2)
    assert(math.abs(f(0) - 0.299f) < 1e-3) // red
    assert(math.abs(f(1) - 0.587f) < 1e-3) // green
    assert(math.abs(f(2) - 0.114f) < 1e-3) // blue
    assert(math.abs(f(3) - 1.0f) < 1e-3)   // white
  }

  test("real PNG payload resizes through a real codec round-trip") {
    val png = png2x2
    import spark.implicits._
    val df = Seq((0L, png)).toDF("doc_id", "content")
    val r = Multimodal.resizeImages(df, "doc_id", "content", 4, 4).collect()(0)
    val meta = r.getStruct(2)
    assert(meta.getInt(1) == 4 && meta.getInt(2) == 4 && meta.getInt(3) == 3)
    val outBytes = r.getAs[Array[Byte]](1)
    assert(meta.getInt(0) == outBytes.length)
    // the resized payload is itself a decodable PNG of the target size
    val back = Multimodal.decodeImage(outBytes).get
    assert(back.getWidth == 4 && back.getHeight == 4)
    // nearest-neighbor upsample: out(x, y) = src(x/2, y/2)
    assert((back.getRGB(0, 0) & 0xffffff) == 0xff0000)
    assert((back.getRGB(3, 0) & 0xffffff) == 0x00ff00)
    assert((back.getRGB(0, 3) & 0xffffff) == 0x0000ff)
    assert((back.getRGB(3, 3) & 0xffffff) == 0xffffff)
  }

  test("features feed similarity search end-to-end") {
    val feats = Multimodal.extractFeatures(binDf, "doc_id", "content", dims = 16)
    val corpus = feats.select(col("doc_id").as("id"), col("features").as("embedding"))
    val queries = feats.filter("doc_id < 2")
      .select(col("doc_id").as("qid"), col("features").as("embedding"))
    val topk = graft.ops.Similarity.bruteForceTopK(queries, corpus, k = 3)
    assert(topk.count() == 6) // 2 queries x 3 neighbors
  }

  /** A real PCM-16 mono WAV, generated through the JDK encoder. */
  private def wavBytes(samples: Array[Short], sampleRate: Float): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) { // little-endian per fmt
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** 0.5 s silence then 0.5 s of a `freq`-Hz sine at 8 kHz. */
  private def silenceThenTone(freq: Double, amp: Double = 0.8): Array[Short] =
    Array.tabulate(8000) { i =>
      if (i < 4000) 0.toShort
      else (math.sin(2 * math.Pi * freq * (i - 4000) / 8000.0) * amp * 32767).toShort
    }

  test("real WAV payload decodes to exact metadata and envelope features") {
    val wav = wavBytes(silenceThenTone(440), 8000f)
    val clip = Multimodal.decodeAudio(wav).get
    assert(clip.sampleRate == 8000f && clip.channels == 1 && clip.frames == 8000L)
    import spark.implicits._
    val df = Seq((0L, wav)).toDF("doc_id", "content")
    val r = Multimodal.extractAudioFeatures(df, "doc_id", "content", dims = 8).collect()(0)
    val meta = r.getStruct(1)
    assert(meta.getInt(0) == wav.length)
    assert(meta.getInt(1) == 8000 && meta.getInt(2) == 1 && meta.getLong(3) == 8000L)
    assert(math.abs(meta.getDouble(4) - 1000.0) < 1e-9) // exactly 1 s
    // energy envelope (first 4 slots): halves 1-2 silent, 3-4 loud
    val f = r.getSeq[Float](2)
    assert(f(0) < 0.01f && f(1) < 0.01f, s"silent windows: ${f.take(4)}")
    assert(f(2) > 0.3f && f(3) > 0.3f, s"tone windows: ${f.take(4)}")
    // ZCR (last 4): a 440 Hz tone crosses ~880 times/s -> ~0.11/sample
    assert(f(6) > 0.05f && f(7) > 0.05f, s"zcr: ${f.drop(4)}")
    // deterministic
    val again = Multimodal.extractAudioFeatures(df, "doc_id", "content", dims = 8)
      .collect()(0).getSeq[Float](2)
    assert(again == f)
  }

  test("audio features feed cosine near-dup search — clones pair, the distinct tone doesn't") {
    import spark.implicits._
    // two near-identical 440 Hz clips (one at slightly lower gain) and
    // one 3700 Hz clip with a different envelope (tone first, silence
    // after) — near-dup must flag ONLY the 440 Hz pair
    val a = wavBytes(silenceThenTone(440), 8000f)
    val b = wavBytes(silenceThenTone(440, amp = 0.72), 8000f)
    val c = wavBytes(
      Array.tabulate(8000) { i =>
        if (i >= 4000) 0.toShort
        else (math.sin(2 * math.Pi * 3700 * i / 8000.0) * 0.8 * 32767).toShort
      }, 8000f)
    val df = Seq((0L, a), (1L, b), (2L, c)).toDF("doc_id", "content")
    // dims = 64 matches cosineNearDupPairs' hyperplane dimensionality
    val feats = Multimodal.extractAudioFeatures(df, "doc_id", "content", dims = 64)
      .select(col("doc_id").as("id"), col("features").as("embedding"))
    val pairs = graft.ops.Similarity
      .cosineNearDupPairs(feats, thresholdQ = 9900L, numPlanes = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)), s"pairs=$pairs")
  }

  test("degenerate clips: 0- and 1-sample inputs produce zero features, no OOB") {
    // 1 sample: the ZCR window used to index samples(1) out of bounds, and
    // the exception escaped decodeAudio's try — failing the whole task.
    for (n <- Seq(0, 1)) {
      val feats = Multimodal.audioEnvelopeFeatures(new Array[Float](n), dims = 8)
      assert(feats.length == 8)
      assert(feats.drop(4).forall(_ == 0f), s"ZCR slots must be 0 for n=$n")
    }
    // and through the full decode+feature path with a real 1-sample WAV
    val wav = wavBytes(Array[Short](12345), 8000f)
    assert(Multimodal.decodeAudio(wav).exists(_.frames == 1L))
    import spark.implicits._
    val df = Seq((1L, wav)).toDF("doc_id", "content")
    val r = Multimodal.extractAudioFeatures(df, "doc_id", "content", dims = 8).collect()(0)
    assert(r.getAs[scala.collection.Seq[Float]]("features").length == 8)
  }

  test("non-audio payloads fall back to the deterministic stub") {
    import spark.implicits._
    val junk = "definitely not audio".getBytes("UTF-8")
    assert(Multimodal.decodeAudio(junk).isEmpty)
    val df = Seq((7L, junk)).toDF("doc_id", "content")
    val r = Multimodal.extractAudioFeatures(df, "doc_id", "content", dims = 4).collect()(0)
    val meta = r.getStruct(1)
    val (sr, ch, fr) = Multimodal.decodeAudioStub(junk)
    assert(meta.getInt(1) == sr && meta.getInt(2) == ch && meta.getLong(3) == fr)
    assert(r.getSeq[Float](2).length == 4)
  }
}

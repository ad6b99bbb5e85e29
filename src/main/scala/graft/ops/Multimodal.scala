package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video as opaque `binary`
  * columns with typed metadata, processed by batched per-partition
  * kernels (the Scala analog of pandas-batch UDFs: one partition = one
  * batch stream, amortized setup per batch).
  *
  * Image decoding is REAL for the formats the JDK ships codecs for
  * (PNG, JPEG, BMP, GIF, WBMP via `javax.imageio` — zero external
  * dependencies); payloads no installed reader claims fall back to the
  * deterministic header-byte stub below, clearly marked, so the opaque-
  * binary plumbing stays exercisable with synthetic payloads. The
  * Spark-side plumbing is real throughout: binary schema, per-partition
  * batching, struct metadata output, feature vectors sized for
  * downstream [[Similarity]] search.
  */
object Multimodal {

  // keep ImageIO memory-only: the default stream-decode path spills
  // through a disk cache file per image, which an executor thread pool
  // would hammer
  javax.imageio.ImageIO.setUseCache(false)

  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  /** Real JDK decode via `javax.imageio.ImageIO`. None when no
    * installed reader recognizes the byte stream (or it is
    * truncated/corrupt). */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException => None }

  /** STUB fallback ======================================================
    * Used only for payloads [[decodeImage]] cannot read (synthetic test
    * bytes, formats outside the JDK codec set — e.g. WebP/AVIF, which
    * would need an external ImageIO plugin). Derives deterministic
    * "dimensions" from header bytes so tests can assert exact values. */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val b0 = if (bytes.length > 0) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    (64 + b0 % 64, 64 + b1 % 64, 3)
  }
  // ======================================================================

  /** Decode metadata: real codec first, stub fallback. */
  def decodeMeta(bytes: Array[Byte]): (Int, Int, Int) =
    decodeImage(bytes) match {
      case Some(img) => (img.getWidth, img.getHeight, img.getColorModel.getNumComponents)
      case None      => decodeImageStub(bytes)
    }

  /** Real image features for decodable payloads: mean luminance over a
    * ~sqrt(dims) × sqrt(dims) grid, normalized to [0, 1] — a genuine
    * (if simple) visual signature suitable for near-dup bucketing.
    * A production pipeline swaps this for a CNN embedding; the batch
    * shape and output type are identical. */
  def gridLuminanceFeatures(img: java.awt.image.BufferedImage, dims: Int): Array[Float] = {
    val gw = math.ceil(math.sqrt(dims.toDouble)).toInt
    val out = new Array[Float](dims)
    val w = img.getWidth; val h = img.getHeight
    var d = 0
    while (d < dims) {
      val cx = d % gw; val cy = d / gw
      val x0 = cx * w / gw; val x1 = math.max(x0 + 1, (cx + 1) * w / gw)
      val y0 = cy * h / gw; val y1 = math.max(y0 + 1, (cy + 1) * h / gw)
      var sum = 0.0; var n = 0
      var y = math.min(y0, h - 1)
      while (y < math.min(y1, h)) {
        var x = math.min(x0, w - 1)
        while (x < math.min(x1, w)) {
          val rgb = img.getRGB(x, y)
          val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
          sum += lum; n += 1
          x += 1
        }
        y += 1
      }
      out(d) = if (n == 0) 0f else (sum / n / 255.0).toFloat
      d += 1
    }
    out
  }

  /** Deterministic fake feature vector (fallback for payloads the JDK
    * cannot decode); real plumbing: fixed dims, Array[Float]. */
  def featureStub(bytes: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var d = 0
    while (d < dims) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(d) = ((h >>> 40).toInt % 1000) / 1000.0f
      d += 1
    }
    out
  }

  /** Decode + feature-extract over a (id, content: binary) frame: one
    * partition-batched pass emitting (id, meta struct, features). */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String, dims: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("meta", metaSchema, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    implicit val enc = Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.select(col(idCol), col(binCol)).mapPartitions { it =>
      // per-batch setup happens once per partition (codec init in a
      // real implementation)
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val decoded = decodeImage(bytes)
        val (w, h, c) = decoded match {
          case Some(img) => (img.getWidth, img.getHeight, img.getColorModel.getNumComponents)
          case None      => decodeImageStub(bytes)
        }
        val features = decoded match {
          case Some(img) => gridLuminanceFeatures(img, dims)
          case None      => featureStub(bytes, dims)
        }
        val meta = new GenericRowWithSchema(
          Array[Any](bytes.length, w, h, c), metaSchema)
        new GenericRowWithSchema(
          Array[Any](r.get(0), meta, features), outSchema): Row
      }
    }
  }

  /** Deterministic nearest-neighbor resample + PNG re-encode for a
    * decodable image. Nearest-neighbor (not Graphics2D SCALE_SMOOTH)
    * keeps the output bit-reproducible across JVMs. */
  def resizeImageBytes(
      img: java.awt.image.BufferedImage, targetW: Int, targetH: Int): Array[Byte] = {
    import java.awt.image.BufferedImage
    val kind =
      if (img.getColorModel.hasAlpha) BufferedImage.TYPE_INT_ARGB
      else BufferedImage.TYPE_INT_RGB
    val out = new BufferedImage(targetW, targetH, kind)
    var y = 0
    while (y < targetH) {
      var x = 0
      while (x < targetW) {
        out.setRGB(x, y, img.getRGB(x * img.getWidth / targetW, y * img.getHeight / targetH))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Resize over a (id, content: binary) frame: emits (id, resized
    * binary, meta) with meta.width/height pinned to the target.
    * Decodable payloads get a real nearest-neighbor resample re-encoded
    * as PNG ([[resizeImageBytes]]); codec-less payloads keep the
    * deterministic byte stride-sample STUB so synthetic binaries still
    * flow through the same plumbing. */
  def resizeImages(
      df: DataFrame, idCol: String, binCol: String,
      targetW: Int, targetH: Int): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("content", BinaryType, nullable = false),
      StructField("meta", metaSchema, nullable = false)))
    implicit val enc = Encoders.row(outSchema)
    df.select(col(idCol), col(binCol)).mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val (out, c) = decodeImage(bytes) match {
          case Some(img) =>
            val resized = resizeImageBytes(img, targetW, targetH)
            val channels = if (img.getColorModel.hasAlpha) 4 else 3
            (resized, channels)
          case None => // STUB fallback: deterministic stride-sample
            val (_, _, c) = decodeImageStub(bytes)
            val n = targetW * targetH * c
            val buf = new Array[Byte](n)
            if (bytes.nonEmpty) {
              var i = 0
              while (i < n) { buf(i) = bytes((i.toLong * bytes.length / n).toInt); i += 1 }
            }
            (buf, c)
        }
        val meta = new GenericRowWithSchema(
          Array[Any](out.length, targetW, targetH, c), metaSchema)
        new GenericRowWithSchema(Array[Any](r.get(0), out, meta), outSchema): Row
      }
    }
  }

  // --------------------------------------------------------------------
  // Audio columns: WAV/PCM via javax.sound.sampled (zero external deps,
  // same decode-real/stub-fallback pattern as the ImageIO path above).

  val audioMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", DoubleType, nullable = false)))

  /** A decoded clip: format metadata + the mono-mixed samples in
    * [-1, 1] (channels averaged per frame). */
  final case class AudioClip(
      sampleRate: Float, channels: Int, frames: Long, samples: Array[Float])

  /** Real JDK decode via `javax.sound.sampled.AudioSystem`: WAV/AIFF/AU
    * containers with signed PCM payloads (8- or 16-bit, either
    * endianness). None when no installed reader recognizes the stream or
    * the encoding is not plain signed PCM. */
  def decodeAudio(bytes: Array[Byte]): Option[AudioClip] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      val ok = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        (fmt.getSampleSizeInBits == 16 || fmt.getSampleSizeInBits == 8)
      if (!ok) { ais.close(); None }
      else {
        val data = ais.readAllBytes(); ais.close()
        val ch = fmt.getChannels
        val bytesPerSample = fmt.getSampleSizeInBits / 8
        val frameBytes = bytesPerSample * ch
        val nFrames = data.length / frameBytes
        val mono = new Array[Float](nFrames)
        val big = fmt.isBigEndian
        var f = 0
        while (f < nFrames) {
          var acc = 0.0f; var c = 0
          while (c < ch) {
            val off = f * frameBytes + c * bytesPerSample
            val v =
              if (bytesPerSample == 2) {
                val s = if (big) ((data(off) << 8) | (data(off + 1) & 0xff))
                        else ((data(off + 1) << 8) | (data(off) & 0xff))
                s.toShort / 32768.0f
              } else data(off) / 128.0f
            acc += v; c += 1
          }
          mono(f) = acc / ch
          f += 1
        }
        Some(AudioClip(fmt.getSampleRate, ch, nFrames.toLong, mono))
      }
    } catch { case _: Exception => None }

  /** Real audio features: the first `dims/2` slots are per-window RMS
    * energy (the clip split into equal windows — an energy envelope),
    * the rest per-window zero-crossing rate (a crude spectral proxy:
    * high for noise/fricatives, low for tonal content). Deterministic,
    * [0, 1]-bounded, sized for [[Similarity]] search; a production
    * pipeline swaps in a learned audio embedding with the same shape. */
  def audioEnvelopeFeatures(samples: Array[Float], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    val n = samples.length
    if (n == 0) return out
    val half = (dims + 1) / 2
    var w = 0
    while (w < half) {
      val lo = (w.toLong * n / half).toInt
      val hi = math.max(lo + 1, ((w + 1).toLong * n / half).toInt)
      var sum = 0.0; var i = lo
      while (i < hi) { sum += samples(i).toDouble * samples(i); i += 1 }
      out(w) = math.sqrt(sum / (hi - lo)).toFloat
      w += 1
    }
    val zhalf = dims - half
    // ZCR needs a predecessor sample: with n == 1, lo=max(1,..)=1 and
    // hi=max(lo+1,..)=2 would index past the array (and the exception
    // escapes decodeAudio's try, failing the whole task). ZCR of a
    // single sample is 0 — the zero-initialized slots already say so.
    var z = 0
    while (z < zhalf && n >= 2) {
      val lo = math.max(1, (z.toLong * n / zhalf).toInt)
      val hi = math.min(n, math.max(lo + 1, ((z + 1).toLong * n / zhalf).toInt))
      var crossings = 0; var i = lo
      while (i < hi) {
        if ((samples(i) >= 0f) != (samples(i - 1) >= 0f)) crossings += 1
        i += 1
      }
      out(half + z) = crossings.toFloat / (hi - lo)
      z += 1
    }
    out
  }

  /** STUB fallback for payloads [[decodeAudio]] cannot read (synthetic
    * test bytes, compressed codecs outside the JDK set — e.g. MP3/OGG).
    * Deterministic header-derived metadata, same shape as the real path. */
  def decodeAudioStub(bytes: Array[Byte]): (Int, Int, Long) = {
    val b0 = if (bytes.length > 0) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    (8000 + (b0 % 8) * 1000, 1 + b1 % 2, bytes.length.toLong / 2)
  }

  /** Decode + feature-extract over a (id, content: binary) audio frame:
    * one partition-batched pass emitting (id, meta struct, features).
    * Real `javax.sound.sampled` decode with energy/ZCR features for PCM
    * payloads; the deterministic stub keeps codec-less payloads flowing
    * through identical plumbing. */
  def extractAudioFeatures(
      df: DataFrame, idCol: String, binCol: String, dims: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("meta", audioMetaSchema, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    implicit val enc = Encoders.row(outSchema)
    df.select(col(idCol), col(binCol)).mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val (rate, ch, frames, features) = decodeAudio(bytes) match {
          case Some(clip) =>
            (math.round(clip.sampleRate), clip.channels, clip.frames,
              audioEnvelopeFeatures(clip.samples, dims))
          case None =>
            val (sr, c, fr) = decodeAudioStub(bytes)
            (sr, c, fr, featureStub(bytes, dims))
        }
        val durationMs = if (rate == 0) 0.0 else frames * 1000.0 / rate
        val meta = new GenericRowWithSchema(
          Array[Any](bytes.length, rate, ch, frames, durationMs), audioMetaSchema)
        new GenericRowWithSchema(
          Array[Any](r.get(0), meta, features), outSchema): Row
      }
    }
  }

  /** Frame sampling for "video" binary payloads: every `stride`-th
    * fixed-size block becomes one frame row (id, frame_idx, frame). */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int, stride: Int): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    implicit val enc = Encoders.row(outSchema)
    df.select(col(idCol), col(binCol)).flatMap { r =>
      val bytes = r.getAs[Array[Byte]](1)
      val nFrames = bytes.length / frameBytes
      (0 until nFrames by stride).iterator.map { f =>
        new GenericRowWithSchema(
          Array[Any](r.get(0), f,
            java.util.Arrays.copyOfRange(bytes, f * frameBytes, (f + 1) * frameBytes)),
          outSchema): Row
      }
    }
  }
}

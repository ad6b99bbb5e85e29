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
  * The actual media decoding is STUBBED — this container has no
  * image/audio codecs — with a deterministic fake that reads header
  * bytes, clearly marked below. The Spark-side plumbing is real: binary
  * schema, per-partition batching, struct metadata output, feature
  * vectors sized for downstream [[Similarity]] search.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  /** STUB decode =========================================================
    * A real deployment replaces this body with an actual codec call
    * (e.g. TwelveMonkeys/JAI for images) keeping the same signature.
    * The fake derives deterministic "dimensions" from header bytes so
    * tests can assert exact values. */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val b0 = if (bytes.length > 0) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    (64 + b0 % 64, 64 + b1 % 64, 3)
  }
  // ======================================================================

  /** Deterministic fake feature vector (stands in for a CNN embedding);
    * real plumbing: fixed dims, Array[Float], batch-amortized. */
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
        val (w, h, c) = decodeImageStub(bytes)
        val meta = new GenericRowWithSchema(
          Array[Any](bytes.length, w, h, c), metaSchema)
        new GenericRowWithSchema(
          Array[Any](r.get(0), meta, featureStub(bytes, dims)), outSchema): Row
      }
    }
  }

  /** Resize over a (id, content: binary) frame: emits (id, resized
    * binary, meta) with meta.width/height pinned to the target. The
    * pixel resampling itself is part of the STUB (deterministic byte
    * stride-sample into a w*h*channels buffer); the plumbing — binary
    * in/out, struct metadata, per-partition batching — is real. */
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
        val (_, _, c) = decodeImageStub(bytes)
        val n = targetW * targetH * c
        val out = new Array[Byte](n)
        if (bytes.nonEmpty) {
          var i = 0
          while (i < n) { out(i) = bytes((i.toLong * bytes.length / n).toInt); i += 1 }
        }
        val meta = new GenericRowWithSchema(
          Array[Any](n, targetW, targetH, c), metaSchema)
        new GenericRowWithSchema(Array[Any](r.get(0), out, meta), outSchema): Row
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

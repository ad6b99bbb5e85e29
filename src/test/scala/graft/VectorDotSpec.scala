package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

class VectorDotSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  test("native FloatVectorDot matches the higher-order-function fold bit-for-bit") {
    import spark.implicits._
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
      .select($"vec_id", $"embedding")
    val a = df.as("a"); val b = df.as("b")
    val pairs = a.join(b, col("a.vec_id") < col("b.vec_id"))
      .select(
        Similarity.dot(col("a.embedding"), col("b.embedding")).as("native"),
        Similarity.dotHof(col("a.embedding"), col("b.embedding")).as("hof"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}")
    }
  }

  test("null inputs yield null") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0f, 2.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(graft.functions.VectorDot.floatVectorDot(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("accepts double arrays and mixed float×double (hyperplane dot shape)") {
    import spark.implicits._
    val dd = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(dd.select(graft.functions.VectorDot.floatVectorDot(col("a"), col("b")))
      .collect()(0).getDouble(0) == 32.0)
    val fd = Seq((Array(1.0f, 2.0f), Array(0.5, 0.25))).toDF("a", "b")
    assert(fd.select(graft.functions.VectorDot.floatVectorDot(col("a"), col("b")))
      .collect()(0).getDouble(0) == 1.0)
  }

  test("rejects non-numeric arrays at analysis time") {
    import spark.implicits._
    val df = Seq((Array("x", "y"), Array("x", "y"))).toDF("a", "b")
    intercept[Exception] {
      df.select(graft.functions.VectorDot.floatVectorDot(col("a"), col("b"))).collect()
    }
  }
}
